"""TSD transducer search vs a per-utterance numpy oracle that mirrors the
reference `time_sync_decoding` (`espnet/nets/beam_search_transducer.py:332`)
— per-frame expansion loop, blank accumulation into the A pool with
logaddexp merging of identical label sequences."""

import numpy as np

import jax.numpy as jnp

from espnet_tpu.decode.transducer_search import (
    TransducerSearchConfig, batched_transducer_tsd,
)

V, DE, H = 6, 5, 4


def _model(seed=0):
    rng = np.random.RandomState(seed)
    emb = rng.randn(V, H).astype(np.float32) * 0.5
    wj_e = rng.randn(DE, V).astype(np.float32)
    wj_d = rng.randn(H, V).astype(np.float32)

    def joint_np(e, d):
        return np.tanh(e @ wj_e) + d @ wj_d

    def joint_fn(e, d):
        return jnp.tanh(e @ jnp.asarray(wj_e)) + d @ jnp.asarray(wj_d)

    def dec_init(n):
        return jnp.zeros((n, H)), jnp.zeros((n, H))

    def dec_step(state, tok):
        out = jnp.tanh(jnp.asarray(emb)[tok] + 0.5 * state)
        return out, out

    def dec_init_np():
        return np.zeros(H, np.float32), np.zeros(H, np.float32)

    def dec_step_np(state, tok):
        out = np.tanh(emb[tok] + 0.5 * state)
        return out, out

    return joint_fn, dec_init, dec_step, joint_np, dec_init_np, dec_step_np


def _log_softmax(x):
    x = x - x.max()
    return x - np.log(np.exp(x).sum())


def tsd_numpy(enc, enc_len, joint_np, dec_init_np, dec_step_np, w,
              max_sym_exp, blank, score_norm):
    """Mirror of reference time_sync_decoding with python lists."""
    out0, st0 = dec_init_np()
    B = [{"yseq": (), "score": 0.0, "out": out0, "state": st0}]
    for t in range(enc_len):
        A = []  # list of dicts; merged on yseq
        C = B
        for v in range(max_sym_exp):
            D = []
            lps = [_log_softmax(joint_np(enc[t], h["out"])) for h in C]
            # blank into A with logaddexp merge on identical yseq
            for h, lp in zip(C, lps):
                sc = h["score"] + lp[blank]
                for a in A:
                    if a["yseq"] == h["yseq"]:
                        a["score"] = np.logaddexp(a["score"], sc)
                        break
                else:
                    A.append({**h, "score": sc})
            if v < max_sym_exp - 1:
                for h, lp in zip(C, lps):
                    for k in range(V):
                        if k == blank:
                            continue
                        D.append((h, k, h["score"] + lp[k]))
                D.sort(key=lambda x: -x[2])
                C = []
                for h, k, sc in D[:w]:
                    out, st = dec_step_np(h["state"], k)
                    C.append({"yseq": h["yseq"] + (k,), "score": sc,
                              "out": out, "state": st})
        A.sort(key=lambda x: -x["score"])
        B = A[:w]
    key = (lambda h: h["score"] / max(len(h["yseq"]), 1)) if score_norm \
        else (lambda h: h["score"])
    best = max(B, key=key)
    return list(best["yseq"]), key(best)


def test_tsd_matches_numpy_oracle():
    joint_fn, dec_init, dec_step, joint_np, dec_init_np, dec_step_np = \
        _model(0)
    rng = np.random.RandomState(1)
    b, t_max = 3, 7
    enc = rng.randn(b, t_max, DE).astype(np.float32)
    enc_lens = np.array([7, 5, 3], np.int32)
    cfg = TransducerSearchConfig(beam_size=3, max_expansions=2,
                                 max_tokens=16, score_norm=True)
    toks, lens, scores = batched_transducer_tsd(
        jnp.asarray(enc), jnp.asarray(enc_lens),
        joint_fn=joint_fn, dec_init=dec_init, dec_step=dec_step, config=cfg,
    )
    for i in range(b):
        ref_y, ref_sc = tsd_numpy(
            enc[i], int(enc_lens[i]), joint_np, dec_init_np, dec_step_np,
            w=3, max_sym_exp=3, blank=0, score_norm=True,
        )
        got = list(np.asarray(toks[i][: int(lens[i])]))
        assert got == ref_y, (i, got, ref_y)
        np.testing.assert_allclose(float(scores[i]), ref_sc, rtol=1e-4)


def test_tsd_merging_raises_score():
    """With expansions allowed, merged prefix mass must be >= the pure
    single-path score (logaddexp merge adds probability mass)."""
    joint_fn, dec_init, dec_step, *_ = _model(2)
    rng = np.random.RandomState(3)
    enc = jnp.asarray(rng.randn(1, 6, DE).astype(np.float32))
    lens = jnp.asarray([6], np.int32)
    cfg1 = TransducerSearchConfig(beam_size=3, max_expansions=1,
                                  max_tokens=8, score_norm=False)
    cfg3 = TransducerSearchConfig(beam_size=3, max_expansions=3,
                                  max_tokens=8, score_norm=False)
    _, _, s1 = batched_transducer_tsd(
        enc, lens, joint_fn=joint_fn, dec_init=dec_init, dec_step=dec_step,
        config=cfg1)
    _, _, s3 = batched_transducer_tsd(
        enc, lens, joint_fn=joint_fn, dec_init=dec_init, dec_step=dec_step,
        config=cfg3)
    assert float(s3[0]) >= float(s1[0]) - 1e-5


def test_tsd_via_model_and_inference():
    """TransducerASRModel.tsd_search + Speech2TextTransducer(search='tsd')
    produce consistent finite-scored hypotheses."""
    import jax

    from espnet_tpu.decode.transducer_inference import Speech2TextTransducer
    from espnet_tpu.models.transducer import (
        TransducerASRModel, TransducerConfig,
    )

    cfg = TransducerConfig(
        vocab_size=8, input_type="feats", n_mels=10, use_specaug=False,
        encoder_type="transformer", d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, decoder_embed_dim=16, decoder_hidden=16,
        joint_dim=16, dropout_rate=0.0,
    )
    model = TransducerASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 10))
    flens = jnp.array([40, 24])
    text = jnp.array([[3, 5, 2], [7, 1, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init(rng, feats, flens, text, tlens, True)
    s2t = Speech2TextTransducer(model, params["params"], beam_size=3,
                                max_tokens=8, search="tsd")
    res = s2t(np.asarray(feats), np.asarray(flens))
    assert len(res) == 2
    for r in res:
        assert np.isfinite(r.score)
