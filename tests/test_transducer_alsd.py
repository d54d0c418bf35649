"""ALSD transducer search vs a per-utterance numpy oracle of the same
semantics (reference `beam_search_transducer.py` "alsd" mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from espnet_tpu.decode.transducer_search import (
    TransducerSearchConfig, batched_transducer_alsd,
)

V, DE, H = 6, 5, 4


def _model(seed=0):
    rng = np.random.RandomState(seed)
    emb = rng.randn(V, H).astype(np.float32) * 0.5
    wj_e = rng.randn(DE, V).astype(np.float32)
    wj_d = rng.randn(H, V).astype(np.float32)

    def joint_np(e, d):  # (De,), (H,) -> (V,)
        return np.tanh(e @ wj_e) + d @ wj_d

    def joint_fn(e, d):  # (N, De), (N, H)
        return jnp.tanh(e @ jnp.asarray(wj_e)) + d @ jnp.asarray(wj_d)

    def dec_init(n):
        return jnp.zeros((n, H)), jnp.zeros((n, H))

    def dec_step(state, tok):
        out = jnp.tanh(jnp.asarray(emb)[tok] + 0.5 * state)
        return out, out

    def dec_step_np(state, tok):
        out = np.tanh(emb[tok] + 0.5 * state)
        return out, out

    return joint_fn, dec_init, dec_step, joint_np, dec_step_np


def _log_softmax(x):
    x = x - x.max()
    return x - np.log(np.exp(x).sum())


def alsd_numpy(enc, enc_len, joint_np, dec_step_np, w, blank, lmax, u_max,
               score_norm):
    NEG = -1.0e30
    hyps = [
        dict(score=0.0 if i == 0 else NEG, yseq=[], out=np.zeros(H),
             state=np.zeros(H))
        for i in range(w)
    ]
    fin = [dict(score=NEG, yseq=[]) for _ in range(w)]
    t_total = enc.shape[0]
    for i in range(t_total + min(u_max, lmax)):
        cands = []
        fin_cands = []
        for hi, hyp in enumerate(hyps):
            t_h = i - len(hyp["yseq"])
            alive = t_h < enc_len and hyp["score"] > NEG / 2
            lp = _log_softmax(joint_np(enc[min(t_h, t_total - 1)], hyp["out"]))
            blank_sc = hyp["score"] + lp[blank] if alive else NEG
            if t_h == enc_len - 1:
                fin_cands.append(dict(score=blank_sc, yseq=list(hyp["yseq"])))
                cands.append(dict(score=NEG, hyp=hi, tok=None))
            else:
                cands.append(dict(score=blank_sc, hyp=hi, tok=None))
            for tok in range(V):
                if tok == blank:
                    continue
                sc = (
                    hyp["score"] + lp[tok]
                    if alive and len(hyp["yseq"]) < lmax else NEG
                )
                cands.append(dict(score=sc, hyp=hi, tok=tok))
        fin = sorted(fin + fin_cands, key=lambda d: -d["score"])[:w]
        top = sorted(cands, key=lambda d: -d["score"])[:w]
        new_hyps = []
        for cd in top:
            src = hyps[cd["hyp"]]
            if cd["tok"] is None or cd["score"] <= NEG / 2:
                new_hyps.append(dict(score=cd["score"],
                                     yseq=list(src["yseq"]),
                                     out=src["out"], state=src["state"]))
            else:
                out, st = dec_step_np(src["state"], cd["tok"])
                new_hyps.append(dict(score=cd["score"],
                                     yseq=src["yseq"] + [cd["tok"]],
                                     out=out, state=st))
        hyps = new_hyps
    best = max(
        fin,
        key=lambda d: d["score"] / max(len(d["yseq"]), 1)
        if score_norm else d["score"],
    )
    sc = best["score"] / max(len(best["yseq"]), 1) if score_norm \
        else best["score"]
    return best["yseq"], sc


def test_alsd_matches_numpy_oracle():
    joint_fn, dec_init, dec_step, joint_np, dec_step_np = _model(3)
    rng = np.random.RandomState(7)
    t1, t2 = 9, 6
    enc = rng.randn(2, t1, DE).astype(np.float32)
    lens = np.asarray([t1, t2], np.int32)
    cfg = TransducerSearchConfig(beam_size=3, blank_id=0, max_tokens=12,
                                 score_norm=True)
    toks, lns, scores = batched_transducer_alsd(
        jnp.asarray(enc), jnp.asarray(lens),
        joint_fn=joint_fn, dec_init=dec_init, dec_step=dec_step,
        config=cfg, u_max=8,
    )
    for bi, t_len in enumerate(lens):
        ref_y, ref_s = alsd_numpy(
            enc[bi], int(t_len), joint_np, dec_step_np, 3, 0, 12, 8, True
        )
        got = [int(x) for x in np.asarray(toks[bi, : int(lns[bi])])]
        assert got == ref_y, (bi, got, ref_y)
        np.testing.assert_allclose(float(scores[bi]), ref_s, rtol=1e-4)
