"""Batch schema validation (`espnet_tpu/utils/typecheck.py`, the
reference typeguard layer's role at the batch boundary)."""

import numpy as np
import pytest

from espnet_tpu.utils.typecheck import check_batch


def _good():
    return {
        "speech": np.zeros((2, 100), np.float32),
        "speech_lengths": np.array([100, 80], np.int32),
        "text": np.zeros((2, 5), np.int32),
        "text_lengths": np.array([5, 3], np.int32),
        "keys": ["a", "b"],
    }


def test_good_batch_passes():
    check_batch(_good(), ("speech", "speech_lengths", "text", "text_lengths"))


def test_rejects_float64():
    b = _good()
    b["speech"] = b["speech"].astype(np.float64)
    with pytest.raises(TypeError, match="float64"):
        check_batch(b)


def test_rejects_object_dtype():
    b = _good()
    b["speech"] = np.array([[1, 2], [1]], dtype=object)
    with pytest.raises(TypeError, match="object"):
        check_batch(b)


def test_rejects_batch_dim_mismatch():
    b = _good()
    b["text"] = np.zeros((3, 5), np.int32)
    with pytest.raises(ValueError, match="batch dim"):
        check_batch(b)


def test_rejects_lengths_exceeding_pad():
    b = _good()
    b["speech_lengths"] = np.array([150, 80], np.int32)
    with pytest.raises(ValueError, match="exceeds padded axis"):
        check_batch(b)


def test_rejects_float_lengths_and_missing_keys():
    b = _good()
    b["speech_lengths"] = b["speech_lengths"].astype(np.float32)
    with pytest.raises(TypeError, match="integer"):
        check_batch(b)
    with pytest.raises(KeyError, match="missing"):
        check_batch(_good(), ("speech", "nope"))
