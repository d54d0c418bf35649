"""LookAheadWordLM parity against the reference torch implementation
(`espnet/lm/pytorch_backend/extlm.py:117`), step by step on shared fake
word-LM tables."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
if "/root/reference" not in sys.path:  # pragma: no cover
    sys.path.insert(0, "/root/reference")

# espnet.lm.lm_utils imports chainer/h5py at module level; stub the bits the
# import needs (make_lexical_tree itself is pure python). The stubs are
# removed from sys.modules right after the reference import below — a
# leaked fake `chainer` breaks any later test whose reference import does
# `try: import chainer / except ImportError` (e.g. tts_interface.py:10-16,
# hit by test_reference_parity's tacotron2 test).
import types

_STUBBED: list = []

if "chainer" not in sys.modules:
    chainer = types.ModuleType("chainer")
    training = types.ModuleType("chainer.training")

    class _Ext:  # chainer.training.extension.Extension placeholder
        trigger = None
        priority = 0

    extension = types.ModuleType("chainer.training.extension")
    extension.Extension = _Ext
    training.extension = extension
    chainer.training = training
    dataset = types.ModuleType("chainer.dataset")

    class _Iter:  # chainer.dataset.Iterator placeholder
        pass

    dataset.Iterator = _Iter
    chainer.dataset = dataset
    chainer.Reporter = object
    chainer.report = lambda *a, **k: None
    sys.modules["chainer"] = chainer
    sys.modules["chainer.training"] = training
    sys.modules["chainer.training.extension"] = extension
    sys.modules["chainer.dataset"] = dataset
    _STUBBED += ["chainer", "chainer.training",
                 "chainer.training.extension", "chainer.dataset"]
if "h5py" not in sys.modules:
    try:
        import h5py  # noqa: F401
    except Exception:
        sys.modules["h5py"] = types.ModuleType("h5py")
        _STUBBED.append("h5py")
if "tqdm" not in sys.modules:
    try:
        from tqdm import tqdm  # noqa: F401
    except Exception:
        tqdm_mod = types.ModuleType("tqdm")
        tqdm_mod.tqdm = lambda x, **kw: x
        sys.modules["tqdm"] = tqdm_mod
        _STUBBED.append("tqdm")

try:
    from espnet.lm.pytorch_backend.extlm import LookAheadWordLM as TorchLA
except Exception:  # pragma: no cover
    pytest.skip("reference unavailable", allow_module_level=True)
finally:
    # undo the stubs: the already-imported espnet.lm modules keep their own
    # references; nothing else may see a fake chainer/h5py/tqdm.
    for _name in _STUBBED:
        sys.modules.pop(_name, None)

from espnet_tpu.decode.extlm import (
    LookAheadWordLM, make_lexical_tree,
)

# lexicographically ordered word vocab => contiguous subtree id ranges
WORDS = ["go", "hachi", "ichi", "ni"]
WORD_DICT = {"<blank>": 0, "<unk>": 1}
for i, w in enumerate(WORDS):
    WORD_DICT[w] = 2 + i
WORD_DICT["<eos>"] = 2 + len(WORDS)

CHARS = ["<blank>", "<unk>", "a", "c", "g", "h", "i", "n", "o",
         "<space>", "<eos>"]
SUBWORD_DICT = {c: i for i, c in enumerate(CHARS)}
VW = len(WORD_DICT)
VC = len(CHARS)


class FakeTorchWordLM(torch.nn.Module):
    """Bigram table word LM with the reference's (state, x) protocol."""

    def __init__(self, table):
        super().__init__()
        self.table = torch.from_numpy(table)

    def forward(self, state, x):
        return None, self.table[x.view(-1)]


def test_lookahead_parity_stepwise():
    rng = np.random.RandomState(0)
    table = (rng.randn(VW, VW) * 1.5).astype(np.float32)

    ref_lm = TorchLA(
        FakeTorchWordLM(table), WORD_DICT, SUBWORD_DICT,
        oov_penalty=1e-4, open_vocab=True,
    )

    tree = make_lexical_tree(WORD_DICT, SUBWORD_DICT, WORD_DICT["<unk>"])

    def wordlm_step(cache, words):
        return jnp.asarray(table)[words], cache

    la = LookAheadWordLM(
        wordlm_step, lambda b: jnp.zeros((b, 1)), tree,
        word_eos=WORD_DICT["<eos>"], word_unk=WORD_DICT["<unk>"],
        space=SUBWORD_DICT["<space>"], eos=SUBWORD_DICT["<eos>"],
        subword_size=VC, sos=SUBWORD_DICT["<eos>"], oov_penalty=1e-4,
    )
    score = la.make_score_fn()

    # char stream: "ichi <space> go <space> ax(oov) <space>"
    seq = (list("ichi") + ["<space>"] + list("go") + ["<space>"]
           + list("ac") + ["<space>"] + list("ni"))
    toks = [SUBWORD_DICT["<eos>"]] + [SUBWORD_DICT[c] for c in seq]

    cache = la.init_cache(1)
    ref_state = None
    # NOTE: the reference's init branch contains a typo —
    # `self.var_word_unk = to_device(x, self.var_word_eos)`
    # (`extlm.py:143`) — which silently replaces the <unk> word with <eos>
    # for every OOV. Our implementation keeps the documented semantics
    # (feed <unk>); re-point the reference's tensor so the comparison tests
    # the intended behavior.
    for step_i, t in enumerate(toks):
        got, cache = score(jnp.asarray([t], jnp.int32), 0, cache)
        ref_state, ref_y = ref_lm(ref_state, torch.LongTensor([t]))
        ref_lm.var_word_unk = torch.LongTensor([WORD_DICT["<unk>"]])
        np.testing.assert_allclose(
            np.asarray(got)[0], ref_y.numpy()[0], rtol=1e-4, atol=1e-4,
            err_msg=f"step {step_i} token {t}",
        )


def test_lexical_tree_ranges():
    tree = make_lexical_tree(WORD_DICT, SUBWORD_DICT, WORD_DICT["<unk>"])
    # root child 'i' subtree covers exactly the word "ichi" (id 4)
    i_node = tree.children[0, SUBWORD_DICT["i"]]
    assert i_node >= 0
    assert (tree.lo[i_node], tree.hi[i_node]) == (3, 4)
    # 'g' -> 'o' terminates word "go" (id 2)
    g = tree.children[0, SUBWORD_DICT["g"]]
    go = tree.children[g, SUBWORD_DICT["o"]]
    assert tree.word_id[go] == WORD_DICT["go"]


class FakeTorchCharLM(torch.nn.Module):
    """Bigram-table char LM with the reference (state, x) protocol; state
    counts steps so statefulness is exercised."""

    def __init__(self, table):
        super().__init__()
        self.table = torch.from_numpy(table)

    def forward(self, state, x):
        n = 0 if state is None else state
        return n + 1, self.table[x.view(-1)] + 0.01 * float(n)


def test_multilevel_parity_stepwise():
    from espnet.lm.pytorch_backend.extlm import MultiLevelLM as TorchML

    from espnet_tpu.decode.extlm import MultiLevelLM

    rng = np.random.RandomState(1)
    wtable = (rng.randn(VW, VW) * 1.5).astype(np.float32)
    ctable = (rng.randn(VC, VC) * 1.2).astype(np.float32)

    ref_lm = TorchML(
        FakeTorchWordLM(wtable), FakeTorchCharLM(ctable), WORD_DICT,
        SUBWORD_DICT, subwordlm_weight=0.8, oov_penalty=0.3, open_vocab=True,
    )
    tree = make_lexical_tree(WORD_DICT, SUBWORD_DICT, WORD_DICT["<unk>"])

    def wordlm_step(cache, words):
        return jnp.asarray(wtable)[words], cache

    def clm_step(cache, toks):
        return (jnp.asarray(ctable)[toks] + 0.01 * cache), cache + 1.0

    ml = MultiLevelLM(
        wordlm_step, lambda b: jnp.zeros((b, 1)),
        clm_step, lambda b: jnp.zeros((b,), jnp.float32),
        tree, word_eos=WORD_DICT["<eos>"], word_unk=WORD_DICT["<unk>"],
        space=SUBWORD_DICT["<space>"], eos=SUBWORD_DICT["<eos>"],
        subword_size=VC, subwordlm_weight=0.8, oov_penalty=0.3,
        open_vocab=True,
    )
    score = ml.make_score_fn()

    seq = (list("ichi") + ["<space>"] + list("go") + ["<space>"]
           + list("ac") + ["<space>"] + list("ni") + ["<space>"])
    toks = [SUBWORD_DICT["<eos>"]] + [SUBWORD_DICT[c] for c in seq]

    cache = ml.init_cache(1)
    ref_state = None
    for step_i, t in enumerate(toks):
        got, cache = score(jnp.asarray([t], jnp.int32), 0, cache)
        ref_state, ref_y = ref_lm(ref_state, torch.LongTensor([t]))
        # same reference init typo as LookAheadWordLM: var_word_unk is set
        # to the <eos> tensor; re-point it to test intended semantics
        ref_lm.var_word_unk = torch.LongTensor([WORD_DICT["<unk>"]])
        np.testing.assert_allclose(
            np.asarray(got)[0], ref_y.numpy()[0], rtol=1e-4, atol=1e-4,
            err_msg=f"step {step_i} token {t}",
        )
