"""Beam-search decode (nn/beam.py) pinned against a brute-force oracle.

The oracle re-runs the FULL forward (no KV cache) for every hypothesis at
every step and expands beams in plain numpy — same frozen-eos semantics,
same lax.top_k tie order (flat candidate index ascending). Matching it
token-for-token exercises the whole cached path: prefill, beam-batch
flattening, the per-step cache gather on beam reorder, and the carried
token buffer. (The reference toolkit has no beam search; this is a
framework-native serving capability.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.nn.beam import beam_search
from tempo_tpu.nn.transformer import Transformer, TransformerConfig, generate

VOCAB = 13


def _model(rope=False):
    cfg = TransformerConfig(in_size=VOCAB, block_size=32, n_layer=2,
                            n_head=2, n_embd=16, dropout=0.0, rope=rope)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(7),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


def _oracle_beam(model, params, prompt, max_new, k, eos=None):
    """Brute-force beam search, full re-forward per hypothesis."""

    def last_logp(seq):
        logits = model.apply({"params": params},
                             jnp.asarray([seq], jnp.int32))
        return np.asarray(
            jax.nn.log_softmax(logits[0, -1].astype(jnp.float32)))

    lp = last_logp(prompt)
    order = np.argsort(-lp, kind="stable")[:k]
    beams = [([int(t)], float(lp[t]), eos is not None and int(t) == eos)
             for t in order]
    for _ in range(1, max_new):
        cands = []  # (score, flat_index, parent, token, finished)
        for bi, (seq, sc, fin) in enumerate(beams):
            if fin:
                cands.append((sc, bi * VOCAB + eos, bi, eos, True))
            else:
                lp = last_logp(prompt + seq)
                for v in range(VOCAB):
                    cands.append((sc + float(lp[v]), bi * VOCAB + v, bi, v,
                                  eos is not None and v == eos))
        cands.sort(key=lambda c: (-c[0], c[1]))
        beams = [(beams[bi][0] + [v], sc, fin)
                 for sc, _, bi, v, fin in cands[:k]]
    return beams


def test_beam_width_one_is_greedy():
    model, params = _model()
    idx = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    seqs, scores = beam_search(model, params, idx, max_new_tokens=6,
                               beam_width=1)
    ref = generate(model, params, idx, 6, jax.random.PRNGKey(0),
                   temperature=0.0)
    assert seqs.shape == (2, 1, 9)
    np.testing.assert_array_equal(np.asarray(seqs[:, 0]), np.asarray(ref))
    assert np.all(np.isfinite(np.asarray(scores)))


@pytest.mark.parametrize(
    "rope",
    [pytest.param(False, marks=pytest.mark.slow),  # heavier sibling:
     # the learned-pos-embed variant re-derives the same oracle; the
     # rope variant stays in the fast tier
     True])
def test_beam_matches_bruteforce_oracle(rope):
    model, params = _model(rope)
    prompts = [[1, 2, 3, 4], [9, 8, 7, 6]]
    k, max_new = 3, 5
    seqs, scores = beam_search(model, params,
                               jnp.asarray(prompts, jnp.int32),
                               max_new_tokens=max_new, beam_width=k)
    for bi, prompt in enumerate(prompts):
        ref = _oracle_beam(model, params, prompt, max_new, k)
        for j, (ref_seq, ref_score, _) in enumerate(ref):
            got = np.asarray(seqs[bi, j])
            np.testing.assert_array_equal(got[:len(prompt)], prompt)
            np.testing.assert_array_equal(got[len(prompt):], ref_seq)
            assert abs(float(scores[bi, j]) - ref_score) < 1e-4, (
                bi, j, float(scores[bi, j]), ref_score)


def test_beam_scores_are_sequence_logprobs():
    """scores[i, j] (alpha=0) == sum of per-token log-softmax under a
    full forward of the returned sequence."""
    model, params = _model()
    prompt = [2, 4, 6]
    seqs, scores = beam_search(model, params,
                               jnp.asarray([prompt], jnp.int32),
                               max_new_tokens=4, beam_width=2)
    t0 = len(prompt)
    for j in range(2):
        seq = np.asarray(seqs[0, j])
        logits = model.apply({"params": params},
                             jnp.asarray([seq[:-1]], jnp.int32))
        logp = np.asarray(
            jax.nn.log_softmax(np.asarray(logits[0], np.float32), axis=-1))
        want = sum(logp[t - 1, seq[t]] for t in range(t0, len(seq)))
        assert abs(float(scores[0, j]) - want) < 1e-4


def test_beam_eos_freezes_and_pads():
    model, params = _model()
    prompt = [1, 2, 3, 4]
    # pick the greedy first token as eos so at least one beam finishes
    # immediately and must survive at its frozen score
    greedy = generate(model, params, jnp.asarray([prompt], jnp.int32), 1,
                      jax.random.PRNGKey(0), temperature=0.0)
    eos = int(np.asarray(greedy)[0, -1])
    k, max_new = 3, 5
    seqs, scores = beam_search(model, params,
                               jnp.asarray([prompt], jnp.int32),
                               max_new_tokens=max_new, beam_width=k,
                               eos_id=eos)
    ref = _oracle_beam(model, params, prompt, max_new, k, eos=eos)
    for j, (ref_seq, ref_score, _) in enumerate(ref):
        got = np.asarray(seqs[0, j])[len(prompt):]
        np.testing.assert_array_equal(got, ref_seq)
        assert abs(float(scores[0, j]) - ref_score) < 1e-4
    # everything after a first eos is eos
    for j in range(k):
        tail = np.asarray(seqs[0, j])[len(prompt):]
        hits = np.where(tail == eos)[0]
        if hits.size:
            assert np.all(tail[hits[0]:] == eos)


def test_beam_length_penalty_reranks():
    model, params = _model()
    idx = jnp.asarray([[3, 1, 4]], jnp.int32)
    seqs0, s0 = beam_search(model, params, idx, 5, 3, length_penalty=0.0)
    seqs1, s1 = beam_search(model, params, idx, 5, 3, length_penalty=1.0)
    # no eos => all hypotheses have length 5: penalty is a common positive
    # factor, ordering must be identical and scores scale by ((5+5)/6)
    np.testing.assert_array_equal(np.asarray(seqs0), np.asarray(seqs1))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0) / (10.0 / 6.0),
                               rtol=1e-6)
    # scores sorted best-first in both
    assert np.all(np.diff(np.asarray(s0)[0]) <= 1e-6)
