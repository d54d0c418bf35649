"""Multi-speaker / multi-lingual conditioning + x-vector-role extractor.

Behavioral spec: the reference TTS models' extra-embedding plumbing —
`espnet2/tts/tacotron2/tacotron2.py:203-222` (sid/lid embedding tables
added to encoder states, `:402-408`) and `_integrate_with_spk_embed`
(`:516-523`: "add" = project L2-normalised spembs and add; "concat" =
tile and concatenate), identical logic in `espnet2/tts/fastspeech2/
fastspeech2.py` and `espnet2/gan_tts/vits/generator.py:238-247`.

`SpeakerEmbeddingExtractor` fills the x-vector role of the TTS recipe
(`egs2/TEMPLATE/tts1/tts.sh:346` extracts kaldi x-vectors with a
pretrained nnet): a TDNN + statistics-pooling speaker classifier trained
on the corpus's own utt2spk labels (no pretrained checkpoint exists in
this offline environment), whose pooled pre-softmax layer is the
per-utterance embedding.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.ops.masks import make_valid_mask


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class SpeakerConditioner(nn.Module):
    """Condition (B, T, units) hidden states on sids / lids / spembs.

    Mirrors the reference integration order (tacotron2.py:400-408): sid
    embedding added, lid embedding added, then spk-embedding integrated
    ("add": project normalised spembs to units and add; "concat": tile the
    normalised embedding along T and concatenate, growing the feature dim
    by spk_embed_dim).
    """

    spks: int = 0
    langs: int = 0
    spk_embed_dim: int = 0
    integration_type: str = "add"  # "add" | "concat"
    units: int = 0                 # hidden size of hs
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        if self.spk_embed_dim > 0 and self.integration_type == "concat":
            return self.units + self.spk_embed_dim
        return self.units

    @nn.compact
    def __call__(self, hs, sids=None, lids=None, spembs=None):
        if self.spks > 1:
            if sids is None:
                raise ValueError("spks > 1 but sids not provided")
            hs = hs + nn.Embed(self.spks, self.units, dtype=self.dtype,
                               name="sid_emb")(sids.reshape(-1))[:, None]
        if self.langs > 1:
            if lids is None:
                raise ValueError("langs > 1 but lids not provided")
            hs = hs + nn.Embed(self.langs, self.units, dtype=self.dtype,
                               name="lid_emb")(lids.reshape(-1))[:, None]
        if self.spk_embed_dim > 0:
            if spembs is None:
                raise ValueError("spk_embed_dim > 0 but spembs not provided")
            se = l2_normalize(spembs.astype(jnp.float32)).astype(hs.dtype)
            if self.integration_type == "add":
                hs = hs + nn.Dense(self.units, dtype=self.dtype,
                                   name="projection")(se)[:, None]
            elif self.integration_type == "concat":
                tiled = jnp.broadcast_to(
                    se[:, None], (hs.shape[0], hs.shape[1], se.shape[-1]))
                hs = jnp.concatenate([hs, tiled], axis=-1)
            else:
                raise ValueError(
                    f"unknown integration {self.integration_type!r} "
                    "(support only add or concat)")
        return hs


class SpeakerEmbeddingExtractor(nn.Module):
    """TDNN + stats pooling speaker embedder (x-vector shape).

    feats (B, T, F) -> frame TDNN stack (dilated 1-d convs) -> masked
    mean+std pooling -> embedding (B, embed_dim); `logits=True` adds the
    speaker-classification head used for training.
    """

    n_spk: int = 0
    embed_dim: int = 192
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, logits: bool = False,
                 deterministic: bool = True):
        mask = make_valid_mask(lengths, feats.shape[1])[..., None]
        h = feats * mask.astype(feats.dtype)
        for i, (k, dil) in enumerate([(5, 1), (3, 2), (3, 3), (1, 1)]):
            h = nn.Conv(self.channels, (k,), kernel_dilation=(dil,),
                        padding="SAME", dtype=self.dtype,
                        name=f"tdnn{i}")(h)
            h = nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(h))
            h = h * mask.astype(h.dtype)
        denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        mean = jnp.sum(h, axis=1) / denom
        var = jnp.sum((h - mean[:, None]) ** 2 * mask, axis=1) / denom
        std = jnp.sqrt(var + 1e-8)
        emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="embed")(
            jnp.concatenate([mean, std], axis=-1))
        if not logits:
            return emb
        out = nn.Dense(self.n_spk, dtype=self.dtype, name="classifier")(
            nn.relu(emb))
        return emb, out
