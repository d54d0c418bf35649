"""Multi-level and look-ahead word language models for character beam search.

Behavioral spec: reference `espnet/lm/pytorch_backend/extlm.py`
(`MultiLevelLM:18`, `LookAheadWordLM:117` + `make_lexical_tree`,
`espnet/lm/lm_utils.py:274`): during character-level decoding a word-level
LM is consulted at word boundaries (<space>/<eos>), with either

* MultiLevelLM — a character LM scores within-word transitions (weighted by
  `subwordlm_weight`) and the accumulated char log-prob is replaced by the
  word LM's log-prob when the word completes (prob substitution), or
* LookAheadWordLM — the word LM's probability mass is *distributed over the
  prefix tree* so every character transition already carries word-level
  information (lookahead smearing), no char LM needed.

TPU formulation: the reference walks a python dict trie per hypothesis;
here the lexical tree is compiled once into dense arrays — children
(N, C) int32, word-id (N,), subtree word-range (N, 2) — so a hypothesis's
entire lexical state is ONE int32 node index and every step is gathers +
where over the (B,) beam inside jit. Requires word ids assigned in
lexicographic order so each subtree covers a contiguous id range (the
reference's cumsum trick, `extlm.py:146-199`, has the same requirement).

The word LM plugs in as a pos-free step function
`wordlm_step(cache, words (B,)) -> (logits (B, Vw), cache)`.
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOGZERO = -1.0e10
ZERO = 1.0e-10


class LexicalTree(NamedTuple):
    children: np.ndarray   # (N, C) int32, -1 if absent
    word_id: np.ndarray    # (N,) int32, -1 if not a word end
    lo: np.ndarray         # (N,) int32 subtree word-id range (lo, hi]
    hi: np.ndarray


def make_lexical_tree(
    word_dict: Dict[str, int],
    subword_dict: Dict[str, int],
    word_unk: int,
) -> LexicalTree:
    """Dense-array port of `lm_utils.py:274`. Words whose ids are not in
    lexicographically-contiguous subtree ranges break the cumsum lookups —
    sort the word vocabulary before assigning ids."""
    c_size = len(subword_dict)
    children: List[Dict[int, int]] = [{}]
    word_id: List[int] = [-1]
    lo: List[int] = [0]
    hi: List[int] = [0]

    def new_node(wid):
        children.append({})
        word_id.append(-1)
        lo.append(wid - 1)
        hi.append(wid)
        return len(children) - 1

    for w, wid in sorted(word_dict.items(), key=lambda kv: kv[1]):
        if wid <= 0 or wid == word_unk:
            continue
        if any(ch not in subword_dict for ch in w):
            continue
        node = 0
        for i, ch in enumerate(w):
            cid = subword_dict[ch]
            if cid not in children[node]:
                nxt = new_node(wid)
                children[node][cid] = nxt
            else:
                nxt = children[node][cid]
                lo[nxt] = min(lo[nxt], wid - 1)
                hi[nxt] = max(hi[nxt], wid)
            if i == len(w) - 1:
                word_id[nxt] = wid
            node = nxt

    n = len(children)
    arr = np.full((n, c_size), -1, np.int32)
    for ni, succ in enumerate(children):
        for cid, nxt in succ.items():
            arr[ni, cid] = nxt
    return LexicalTree(
        children=arr,
        word_id=np.asarray(word_id, np.int32),
        lo=np.asarray(lo, np.int32),
        hi=np.asarray(hi, np.int32),
    )


class LookAheadWordLM:
    """`extlm.py:117` as a batched jit-safe scorer.

    cache = (wlm_cache, cumsum (B, Vw), node (B,), fresh (B,)).
    `make_score_fn()` returns the `(tokens, pos, cache) -> (logp, cache)`
    function the beam search's lm slot expects (pos ignored).
    """

    def __init__(
        self,
        wordlm_step: Callable,
        wordlm_cache_init: Callable[[int], any],
        tree: LexicalTree,
        word_eos: int,
        word_unk: int,
        space: int,
        eos: int,
        subword_size: int,
        sos: int = None,
        oov_penalty: float = 1e-4,
    ):
        self.wordlm_step = wordlm_step
        self.wordlm_cache_init = wordlm_cache_init
        self.tree = jax.tree_util.tree_map(jnp.asarray, tree)
        self.word_eos = word_eos
        self.word_unk = word_unk
        self.space = space
        self.eos = eos
        self.sos = eos if sos is None else sos
        self.c_size = subword_size
        self.oov_penalty = oov_penalty

    def init_cache(self, b: int):
        wlm_cache = self.wordlm_cache_init(b)
        vw = self.tree.hi.shape[0]  # placeholder; real Vw from first step
        # cumsum placeholder is created lazily on the first (space-like)
        # step; store zeros of the right width by probing the word lm once
        logits, wlm_cache2 = self.wordlm_step(
            wlm_cache, jnp.full((b,), self.word_eos, jnp.int32)
        )
        cumsum = jnp.cumsum(jax.nn.softmax(logits.astype(jnp.float32)), -1)
        return (wlm_cache2, cumsum,
                jnp.zeros((b,), jnp.int32), jnp.ones((b,), bool))

    def make_score_fn(self):
        tree = self.tree
        space, eos, sos = self.space, self.eos, self.sos
        unk, oov = self.word_unk, self.oov_penalty
        c_size = self.c_size

        def score(tokens, pos, cache):
            del pos
            wlm_cache, cumsum, node, fresh = cache
            b = tokens.shape[0]
            xi = tokens.astype(jnp.int32)
            boundary = (xi == space) | (xi == sos) | fresh

            # inter-word: feed the completed word (or unk / eos when fresh)
            node_safe = jnp.maximum(node, 0)
            wid = tree.word_id[node_safe]
            w = jnp.where(wid >= 0, wid, unk)
            w = jnp.where(fresh, self.word_eos, w)
            logits, wlm_cache_new = self.wordlm_step(wlm_cache, w)
            cumsum_new = jnp.cumsum(
                jax.nn.softmax(logits.astype(jnp.float32)), -1
            )
            cumsum = jnp.where(boundary[:, None], cumsum_new, cumsum)
            wlm_cache = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    boundary.reshape((b,) + (1,) * (new.ndim - 1)), new, old
                ),
                wlm_cache_new, wlm_cache,
            )

            child = tree.children[node_safe, jnp.clip(xi, 0, c_size - 1)]
            new_node = jnp.where(
                boundary, 0, jnp.where(node >= 0, child, -1)
            )

            # lookahead distribution over ALL next chars at once.
            # cumsum[i] = sum_{j<=i} P(word j | hist); a subtree covering
            # word ids (lo, hi] has mass cumsum[hi] - cumsum[lo]
            # (`extlm.py:171-199`).
            nn_safe = jnp.maximum(new_node, 0)

            def range_mass(lo_ids, hi_ids):
                ph = jnp.take_along_axis(cumsum, hi_ids, 1)
                pl = jnp.take_along_axis(cumsum, lo_ids, 1)
                return ph - pl

            sum_prob = jnp.where(
                nn_safe == 0,
                1.0,
                range_mass(tree.lo[nn_safe][:, None],
                           tree.hi[nn_safe][:, None])[:, 0],
            )
            ch_all = tree.children[nn_safe]                 # (B, C)
            ch_safe = jnp.maximum(ch_all, 0)
            child_mass = range_mass(tree.lo[ch_safe], tree.hi[ch_safe])
            unk_prob = range_mass(
                jnp.full((b, 1), unk - 1, jnp.int32),
                jnp.full((b, 1), unk, jnp.int32),
            )[:, 0]
            y = jnp.where(
                ch_all >= 0,
                child_mass / jnp.maximum(sum_prob, ZERO)[:, None],
                (unk_prob * oov)[:, None],
            )                                               # (B, C)

            # word-end columns: <space>/<eos> carry the word probability
            wid_new = tree.word_id[nn_safe]
            wid_safe = jnp.maximum(wid_new, 1)
            wlm_prob = range_mass(
                wid_safe[:, None] - 1, wid_safe[:, None]
            )[:, 0] / jnp.maximum(sum_prob, ZERO)
            col = jnp.where(
                wid_new >= 0, wlm_prob,
                jnp.where(boundary, ZERO, unk_prob * oov),
            )
            y = y.at[:, space].set(col)
            y = y.at[:, eos].set(col)

            log_y = jnp.log(jnp.maximum(y, ZERO))
            # dead subtree (sum_prob ~ 0): reference returns logzero rows;
            # open-vocab (node -1): transition prob 1 (zeros)
            dead = (sum_prob < ZERO) & (nn_safe > 0)
            log_y = jnp.where(dead[:, None], LOGZERO, log_y)
            log_y = jnp.where((new_node < 0)[:, None], 0.0, log_y)

            return log_y, (wlm_cache, cumsum, new_node,
                           jnp.zeros_like(fresh))

        return score


class MultiLevelLM:
    """`extlm.py:18` (MultiLevelLM) as a batched jit-safe scorer: a
    character LM scores within-word transitions (scaled by
    `subwordlm_weight`) and at word boundaries the accumulated char
    log-prob is *substituted* by the word LM's log-prob
    (prob-substitution). <space>/<eos> columns carry
    `wordlm_logprob(word) - accumulated_char_logprob` for word-end nodes,
    `wordlm_logprob(<unk>) + log(oov_penalty)` otherwise, and logzero right
    after a boundary.

    Both LMs plug in as pos-free step functions
    `step(cache, tokens (B,)) -> (logits (B, V), cache)`.

    cache = (clm_cache, wlm_cache, wlm_logprobs (B, Vw), node (B,),
             prev_log_y (B, C), clm_logprob (B,), fresh (B,)).
    The reference's `final()` (word-LM <eos> score at hypothesis end) is a
    beam-search-level hook; here the <eos> column carries the same
    substitution score as <space> (reference `forward` parity).
    """

    def __init__(
        self,
        wordlm_step: Callable,
        wordlm_cache_init: Callable[[int], any],
        subwordlm_step: Callable,
        subwordlm_cache_init: Callable[[int], any],
        tree: LexicalTree,
        word_eos: int,
        word_unk: int,
        space: int,
        eos: int,
        subword_size: int,
        subwordlm_weight: float = 0.8,
        oov_penalty: float = 1.0,
        open_vocab: bool = True,
    ):
        self.wordlm_step = wordlm_step
        self.wordlm_cache_init = wordlm_cache_init
        self.clm_step = subwordlm_step
        self.clm_cache_init = subwordlm_cache_init
        self.tree = jax.tree_util.tree_map(jnp.asarray, tree)
        self.word_eos = word_eos
        self.word_unk = word_unk
        self.space = space
        self.eos = eos
        self.c_size = subword_size
        self.weight = subwordlm_weight
        self.log_oov = float(np.log(oov_penalty))
        self.open_vocab = open_vocab

    def init_cache(self, b: int):
        wlm_cache = self.wordlm_cache_init(b)
        logits, wlm_cache = self.wordlm_step(
            wlm_cache, jnp.full((b,), self.word_eos, jnp.int32)
        )
        wlm_logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        clm_cache = self.clm_cache_init(b)
        return (clm_cache, wlm_cache, wlm_logprobs,
                jnp.zeros((b,), jnp.int32),
                jnp.zeros((b, self.c_size), jnp.float32),
                jnp.zeros((b,), jnp.float32),
                jnp.ones((b,), bool))

    def make_score_fn(self):
        tree = self.tree
        space, eos = self.space, self.eos
        unk = self.word_unk

        def merge(flag, new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    flag.reshape(flag.shape + (1,) * (n.ndim - 1)), n, o
                ),
                new, old,
            )

        def score(tokens, pos, cache):
            del pos
            (clm_cache, wlm_cache, wlm_logprobs, node, prev_log_y,
             clm_logprob, fresh) = cache
            xi = tokens.astype(jnp.int32)
            b = xi.shape[0]
            boundary = (xi == space) & ~fresh

            # inter-word: feed the finished word (unk when the node is not
            # a word end); fresh rows were already primed with <eos> in
            # init_cache and only reset the tree position
            node_safe = jnp.maximum(node, 0)
            wid = jnp.where(node >= 0, tree.word_id[node_safe], -1)
            w = jnp.where(wid >= 0, wid, unk)
            z_wlm, wlm_cache_new = self.wordlm_step(wlm_cache, w)
            wlm_logprobs_new = jax.nn.log_softmax(
                z_wlm.astype(jnp.float32), -1)
            wlm_logprobs = jnp.where(
                boundary[:, None], wlm_logprobs_new, wlm_logprobs)
            wlm_cache = merge(boundary, wlm_cache_new, wlm_cache)

            # tree transition + char-logprob accumulation (intra-word)
            child = jnp.where(
                node >= 0,
                tree.children[node_safe, jnp.clip(xi, 0, self.c_size - 1)],
                -1,
            )
            reset = boundary | fresh
            new_node = jnp.where(reset, 0, child)  # -1 = open-vocab mode
            step_lp = jnp.take_along_axis(
                prev_log_y, xi[:, None], 1)[:, 0]
            clm_logprob = jnp.where(reset, 0.0, clm_logprob + step_lp)
            if self.open_vocab:
                dead = jnp.zeros_like(reset)
            else:
                dead = (~reset) & (child < 0)

            # char LM step (always, reference extlm.py:85-86)
            z_clm, clm_cache = self.clm_step(clm_cache, xi)
            log_y = jax.nn.log_softmax(
                z_clm.astype(jnp.float32), -1) * self.weight

            # word-level substitution on <space>/<eos> columns
            nn_safe = jnp.maximum(new_node, 0)
            wid_new = jnp.where(new_node >= 0, tree.word_id[nn_safe], -1)
            sub = jnp.where(
                wid_new >= 0,
                jnp.take_along_axis(
                    wlm_logprobs, jnp.maximum(wid_new, 0)[:, None], 1
                )[:, 0] - clm_logprob,
                wlm_logprobs[:, unk] + self.log_oov,
            )
            col = jnp.where(reset, LOGZERO, sub)
            log_y = log_y.at[:, space].set(col)
            log_y = log_y.at[:, eos].set(col)
            log_y = jnp.where(dead[:, None], LOGZERO, log_y)

            return log_y, (clm_cache, wlm_cache, wlm_logprobs, new_node,
                           log_y, clm_logprob, jnp.zeros_like(fresh))

        return score
