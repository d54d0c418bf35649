"""Torch-parity for the v1 RNN attention zoo + scheduled sampling.

Each test builds the reference attention
(`espnet/nets/pytorch_backend/rnn/attentions.py`), ports its weights into
the flax module, runs 3 sequential steps with the same decoder states, and
asserts context/weights allclose.  gvec biases (which cancel in the
softmax) are dropped on our side, so only the weight is ported.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:  # pragma: no cover
    sys.path.insert(0, "/root/reference")

try:
    from espnet.nets.pytorch_backend.rnn import attentions as ref_att
except Exception:  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)

from espnet_tpu.models.rnn_attentions import make_attention
from espnet_tpu.ops.masks import make_valid_mask

EPROJS, DUNITS, ATT_DIM = 12, 10, 8
B, T = 2, 9
LENS = [9, 5]


def t2n(t):
    return t.detach().cpu().numpy()


def dense(sd, prefix, bias=True):
    out = {"kernel": t2n(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        out["bias"] = t2n(sd[prefix + ".bias"])
    return out


def conv1d_from_2d(sd, prefix):
    # torch Conv2d(1, C, (1, K)) weight (C, 1, 1, K) -> flax Conv1d (K, 1, C)
    w = t2n(sd[prefix + ".weight"])
    return {"kernel": w[:, :, 0, :].transpose(2, 1, 0)}


def _data(seed=0):
    rng = np.random.RandomState(seed)
    enc = rng.randn(B, T, EPROJS).astype(np.float32)
    decs = [rng.randn(B, DUNITS).astype(np.float32) for _ in range(3)]
    return enc, decs


def _run_ref(att, enc, decs):
    """Drive the torch attention for 3 steps, return per-step (c, w)."""
    att.eval()
    state = None
    outs = []
    with torch.no_grad():
        for z in decs:
            c, state = att(torch.tensor(enc), list(LENS), torch.tensor(z),
                           state)
            w = state
            if isinstance(state, list):      # AttCov/AttCovLoc lists
                w = state[-1]
            elif isinstance(state, tuple):   # AttLocRec (w, (h, c))
                w = state[0]
            elif state is not None and state.dim() == 3:  # AttLoc2D window
                w = state[:, -1]
            outs.append((t2n(c), None if w is None else t2n(w)))
    return outs


def _run_ours(att_type, params, enc, decs, **kw):
    mod = make_attention(att_type, att_dim=ATT_DIM, out_dim=EPROJS, **kw)
    mask = make_valid_mask(jnp.array(LENS), T)
    state = mod.init_state(B, T, mask)
    outs = []
    for z in decs:
        c, w, state = mod.apply({"params": params}, jnp.asarray(enc), mask,
                                jnp.asarray(z), state)
        outs.append((np.asarray(c), np.asarray(w)))
    return outs


def _check(ref_outs, our_outs, atol=2e-5, check_w=True):
    for (rc, rw), (oc, ow) in zip(ref_outs, our_outs):
        np.testing.assert_allclose(oc, rc, rtol=1e-4, atol=atol)
        if check_w and rw is not None and rw.ndim == ow.ndim:
            np.testing.assert_allclose(ow, rw, rtol=1e-4, atol=atol)


def test_att_dot():
    ref = ref_att.AttDot(EPROJS, DUNITS, ATT_DIM)
    sd = ref.state_dict()
    params = {"mlp_enc": dense(sd, "mlp_enc"), "mlp_dec": dense(sd, "mlp_dec")}
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs), _run_ours("dot", params, enc, decs))


def test_att_add():
    ref = ref_att.AttAdd(EPROJS, DUNITS, ATT_DIM)
    sd = ref.state_dict()
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "gvec": dense(sd, "gvec", bias=False),
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs), _run_ours("add", params, enc, decs))


def test_att_loc():
    ref = ref_att.AttLoc(EPROJS, DUNITS, ATT_DIM, aconv_chans=3,
                         aconv_filts=2)
    sd = ref.state_dict()
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "mlp_att": dense(sd, "mlp_att", bias=False),
        "gvec": dense(sd, "gvec", bias=False),
        "loc_conv": conv1d_from_2d(sd, "loc_conv"),
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs),
           _run_ours("location", params, enc, decs, conv_channels=3,
                     conv_kernel=5))


def test_att_cov():
    ref = ref_att.AttCov(EPROJS, DUNITS, ATT_DIM)
    sd = ref.state_dict()
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "wvec": dense(sd, "wvec"),
        "gvec": dense(sd, "gvec", bias=False),
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs),
           _run_ours("coverage", params, enc, decs))


def test_att_cov_loc():
    ref = ref_att.AttCovLoc(EPROJS, DUNITS, ATT_DIM, aconv_chans=3,
                            aconv_filts=2)
    sd = ref.state_dict()
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "mlp_att": dense(sd, "mlp_att", bias=False),
        "gvec": dense(sd, "gvec", bias=False),
        "loc_conv": conv1d_from_2d(sd, "loc_conv"),
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs),
           _run_ours("coverage_location", params, enc, decs,
                     conv_channels=3, conv_kernel=5))


def test_att_loc2d():
    ref = ref_att.AttLoc2D(EPROJS, DUNITS, ATT_DIM, att_win=4,
                           aconv_chans=3, aconv_filts=2)
    sd = ref.state_dict()
    # Conv2d(1, C, (att_win, K)) weight (C, 1, win, K) -> flax (win, K, 1, C)
    w = t2n(sd["loc_conv.weight"]).transpose(2, 3, 1, 0)
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "mlp_att": dense(sd, "mlp_att", bias=False),
        "gvec": dense(sd, "gvec", bias=False),
        "loc_conv": {"kernel": w},
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs),
           _run_ours("location2d", params, enc, decs, conv_channels=3,
                     conv_kernel=5, att_win=4))


def test_att_loc_rec():
    ref = ref_att.AttLocRec(EPROJS, DUNITS, ATT_DIM, aconv_chans=3,
                            aconv_filts=2)
    sd = ref.state_dict()
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "gvec": dense(sd, "gvec", bias=False),
        "loc_conv": conv1d_from_2d(sd, "loc_conv"),
        "lstm_ih": {"kernel": t2n(sd["att_lstm.weight_ih"]).T},
        "lstm_hh": {"kernel": t2n(sd["att_lstm.weight_hh"]).T},
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs),
           _run_ours("location_recurrent", params, enc, decs,
                     conv_channels=3, conv_kernel=5))


def _fuse_heads(sd, prefix, heads, bias):
    kernel = np.concatenate(
        [t2n(sd[f"{prefix}.{h}.weight"]).T for h in range(heads)], axis=1
    )
    out = {"kernel": kernel}
    if bias:
        out["bias"] = np.concatenate(
            [t2n(sd[f"{prefix}.{h}.bias"]) for h in range(heads)]
        )
    return out


def test_att_multi_head_dot():
    heads = 2
    ref = ref_att.AttMultiHeadDot(EPROJS, DUNITS, heads, ATT_DIM, ATT_DIM)
    sd = ref.state_dict()
    params = {
        "mlp_q": _fuse_heads(sd, "mlp_q", heads, True),
        "mlp_k": _fuse_heads(sd, "mlp_k", heads, False),
        "mlp_v": _fuse_heads(sd, "mlp_v", heads, False),
        "mlp_o": dense(sd, "mlp_o", bias=False),
    }
    enc, decs = _data()
    # reference returns per-head w list; only compare contexts
    _check(_run_ref(ref, enc, decs),
           _run_ours("multi_head_dot", params, enc, decs, heads=heads),
           check_w=False)


def test_att_multi_head_add():
    heads = 2
    ref = ref_att.AttMultiHeadAdd(EPROJS, DUNITS, heads, ATT_DIM, ATT_DIM)
    sd = ref.state_dict()
    gv = np.stack([t2n(sd[f"gvec.{h}.weight"])[0] for h in range(heads)])
    params = {
        "mlp_q": _fuse_heads(sd, "mlp_q", heads, True),
        "mlp_k": _fuse_heads(sd, "mlp_k", heads, False),
        "mlp_v": _fuse_heads(sd, "mlp_v", heads, False),
        "mlp_o": dense(sd, "mlp_o", bias=False),
        "gvec": gv,
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs),
           _run_ours("multi_head_add", params, enc, decs, heads=heads),
           check_w=False)


@pytest.mark.parametrize("multi_res", [False, True])
def test_att_multi_head_loc(multi_res):
    heads = 2
    cls = (ref_att.AttMultiHeadMultiResLoc if multi_res
           else ref_att.AttMultiHeadLoc)
    ref = cls(EPROJS, DUNITS, heads, ATT_DIM, ATT_DIM, aconv_chans=3,
              aconv_filts=2)
    sd = ref.state_dict()
    gv = np.stack([t2n(sd[f"gvec.{h}.weight"])[0] for h in range(heads)])
    params = {
        "mlp_q": _fuse_heads(sd, "mlp_q", heads, True),
        "mlp_k": _fuse_heads(sd, "mlp_k", heads, False),
        "mlp_v": _fuse_heads(sd, "mlp_v", heads, False),
        "mlp_o": dense(sd, "mlp_o", bias=False),
        "gvec": gv,
    }
    for h in range(heads):
        params[f"loc_conv{h}"] = conv1d_from_2d(sd, f"loc_conv.{h}")
        params[f"mlp_att{h}"] = dense(sd, f"mlp_att.{h}", bias=False)
    enc, decs = _data()
    att_type = "multi_head_multi_res_loc" if multi_res else "multi_head_loc"
    _check(_run_ref(ref, enc, decs),
           _run_ours(att_type, params, enc, decs, heads=heads,
                     conv_channels=3, conv_kernel=5),
           check_w=False)


def test_att_forward():
    ref = ref_att.AttForward(EPROJS, DUNITS, ATT_DIM, aconv_chans=3,
                             aconv_filts=2)
    sd = ref.state_dict()
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "mlp_att": dense(sd, "mlp_att", bias=False),
        "gvec": dense(sd, "gvec", bias=False),
        "loc_conv": conv1d_from_2d(sd, "loc_conv"),
    }
    enc, decs = _data()
    _check(_run_ref(ref, enc, decs),
           _run_ours("forward", params, enc, decs, conv_channels=3,
                     conv_kernel=5))


def test_att_forward_ta():
    odim = 6
    ref = ref_att.AttForwardTA(EPROJS, DUNITS, ATT_DIM, 3, 2, odim)
    sd = ref.state_dict()
    params = {
        "mlp_enc": dense(sd, "mlp_enc"),
        "mlp_dec": dense(sd, "mlp_dec", bias=False),
        "mlp_att": dense(sd, "mlp_att", bias=False),
        "mlp_ta": dense(sd, "mlp_ta"),
        "gvec": dense(sd, "gvec", bias=False),
        "loc_conv": conv1d_from_2d(sd, "loc_conv"),
    }
    enc, decs = _data()
    rng = np.random.RandomState(7)
    outs_prev = [rng.randn(B, odim).astype(np.float32) for _ in range(3)]
    # reference mlp_ta input order is [c, out_prev, dec_z]
    ref.eval()
    state = None
    ref_outs = []
    with torch.no_grad():
        for z, op in zip(decs, outs_prev):
            c, w = ref(torch.tensor(enc), list(LENS), torch.tensor(z),
                       state, torch.tensor(op))
            state = w
            ref_outs.append((t2n(c), t2n(w)))
    mod = make_attention("forward_ta", att_dim=ATT_DIM, conv_channels=3,
                         conv_kernel=5)
    mask = make_valid_mask(jnp.array(LENS), T)
    st = mod.init_state(B, T, mask)
    for (rc, rw), z, op in zip(ref_outs, decs, outs_prev):
        c, w, st = mod.apply({"params": params}, jnp.asarray(enc), mask,
                             jnp.asarray(z), st, out_prev=jnp.asarray(op))
        np.testing.assert_allclose(np.asarray(c), rc, rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(w), rw, rtol=1e-4, atol=2e-5)


def test_noatt_uniform():
    mod = make_attention("noatt")
    mask = make_valid_mask(jnp.array(LENS), T)
    st = mod.init_state(B, T, mask)
    enc = jnp.asarray(_data()[0])
    c, w, _ = mod.apply({"params": {}}, enc, mask, jnp.zeros((B, DUNITS)), st)
    np.testing.assert_allclose(np.asarray(w[0]), np.full(T, 1 / T), atol=1e-6)
    assert float(w[1, LENS[1]:].sum()) == 0.0
    np.testing.assert_allclose(
        np.asarray(c[1]), np.asarray(enc[1, :LENS[1]].mean(0)), atol=1e-5
    )


def test_decoder_att_types_and_scheduled_sampling():
    """Every zoo type drives the RNNDecoder; scheduled sampling p=1 diverges
    from teacher forcing, p=0 matches, grads finite."""
    from espnet_tpu.models.rnn import RNNDecoder

    rng = jax.random.PRNGKey(0)
    mem = jax.random.normal(rng, (2, 9, 12))
    mlens = jnp.array([9, 5])
    toks = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    tlens = jnp.array([3, 3])

    for att_type in ("dot", "coverage", "location2d", "location_recurrent",
                     "multi_head_dot", "multi_head_loc"):
        dec = RNNDecoder(vocab_size=10, encoder_dim=12, embed_dim=8,
                         hidden=12, num_layers=1, att_type=att_type,
                         att_dim=8, att_conv_channels=2, att_conv_kernel=5,
                         att_heads=2, dropout_rate=0.0)
        params = dec.init(rng, toks, tlens, mem, mlens)
        logits = dec.apply(params, toks, tlens, mem, mlens)
        assert logits.shape == (2, 3, 10)
        # step parity through the beam-search interface
        cache = dec.apply(params, 2, mem, mlens,
                          method=RNNDecoder.score_memory_cache)
        outs = []
        for t in range(3):
            lp, cache = dec.apply(params, toks[:, t], t, mem, mlens, cache,
                                  method=RNNDecoder.score_step)
            outs.append(lp)
        np.testing.assert_allclose(
            np.asarray(jnp.stack(outs, 1)),
            np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1)),
            rtol=2e-4, atol=2e-4,
        )

    # scheduled sampling
    dec0 = RNNDecoder(vocab_size=10, encoder_dim=12, embed_dim=8, hidden=12,
                      att_dim=8, att_conv_channels=2, att_conv_kernel=5,
                      dropout_rate=0.0, sampling_probability=0.0)
    params = dec0.init(rng, toks, tlens, mem, mlens)
    base = dec0.apply(params, toks, tlens, mem, mlens, False,
                      rngs={"dropout": rng, "sampling": rng})
    dec1 = RNNDecoder(vocab_size=10, encoder_dim=12, embed_dim=8, hidden=12,
                      att_dim=8, att_conv_channels=2, att_conv_kernel=5,
                      dropout_rate=0.0, sampling_probability=1.0)
    sampled = dec1.apply(params, toks, tlens, mem, mlens, False,
                         rngs={"dropout": rng, "sampling": rng})
    # step 0 always teacher-forced -> equal; later steps diverge
    np.testing.assert_allclose(np.asarray(base[:, 0]),
                               np.asarray(sampled[:, 0]), atol=1e-6)
    assert float(jnp.abs(base[:, 1:] - sampled[:, 1:]).max()) > 1e-6

    def loss(p):
        lg = dec1.apply(p, toks, tlens, mem, mlens, False,
                        rngs={"dropout": rng, "sampling": rng})
        return jnp.mean(lg ** 2)

    g = jax.grad(loss)(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0
