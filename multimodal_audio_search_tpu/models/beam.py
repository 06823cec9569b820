"""Beam-search decoding with HF semantics (caption parity mode).

The reference decodes captions with num_beams=2, repetition_penalty=1.3,
no_repeat_ngram_size=3, length_penalty=1.0, early_stopping=True
(audio_search.py:366-375). This implements HF's BeamSearchScorer rules as a
fixed-shape lax.while_loop:

  * beams expand to B*k rows (the KV cache reorders by parent via gather),
  * per step: log-softmax -> per-beam logits processors -> cumulative
    scores -> top 2k over (beam, token),
  * EOS candidates ranked < k finalize a hypothesis with score
    sum_logprobs / len**length_penalty; non-EOS candidates fill the next k
    beams,
  * early_stopping=True: a batch row is done once k hypotheses exist,
  * final answer: best finalized hypothesis (falling back to running beams).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig
from .generate import apply_repetition_penalty, ban_repeated_ngrams
from .whisper import (
    WhisperConfig, decode_step, init_cache)

NEG_INF = -1e9


class BeamOut(NamedTuple):
    tokens: jnp.ndarray    # [B, prefix+max_new]
    lengths: jnp.ndarray   # [B] generated length incl. EOS
    scores: jnp.ndarray    # [B] normalized best-hypothesis score


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "decode", "prefix_len", "max_new_tokens",
                     "num_beams"))
def beam_generate(
    params,
    enc_out: jnp.ndarray,          # [B, T_enc, d]
    prefix: jnp.ndarray,           # [B, prefix_len]
    *,
    cfg: WhisperConfig,
    decode: DecodeConfig,
    prefix_len: int,
    max_new_tokens: int,
    num_beams: int = 2,
) -> BeamOut:
    b, k = enc_out.shape[0], num_beams
    total = prefix_len + max_new_tokens
    dtype = enc_out.dtype
    lp = decode.length_penalty

    # expand encoder state to beams: [B*k, ...]
    enc_k = jnp.repeat(enc_out, k, axis=0)
    from .generate import _select_cross_kv
    ckv = _select_cross_kv(params, enc_k, cfg, decode)
    cache = init_cache(cfg, b * k, total, dtype)
    tokens = jnp.full((b * k, total), cfg.pad_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, jnp.repeat(prefix.astype(jnp.int32), k, axis=0), (0, 0))

    beam_scores = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (b,))  # [B*k]
    # finalized hypotheses
    hyp_tokens = jnp.full((b, k, total), cfg.pad_token_id, jnp.int32)
    hyp_scores = jnp.full((b, k), NEG_INF, jnp.float32)
    hyp_len = jnp.zeros((b, k), jnp.int32)
    n_hyps = jnp.zeros((b,), jnp.int32)

    def cond(st):
        pos = st[0]
        n_hyps = st[6]
        return (pos < total - 1) & ~jnp.all(n_hyps >= k)

    def body(st):
        (pos, tokens, cache, beam_scores,
         hyp_tokens, hyp_scores, n_hyps, hyp_len) = st
        logits, cache = decode_step(
            params, tokens[:, pos], pos, cache, ckv, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        valid = jnp.arange(total)[None, :] <= pos
        logp = apply_repetition_penalty(
            logp, tokens, valid, decode.repetition_penalty)
        logp = ban_repeated_ngrams(
            logp, tokens, jnp.full((b * k,), pos + 1),
            decode.no_repeat_ngram_size)
        v = logp.shape[-1]
        in_prefix = pos + 1 < prefix_len

        def prefix_step(_):
            nxt = tokens[:, jnp.minimum(pos + 1, total - 1)]
            return (tokens.at[:, pos + 1].set(nxt), beam_scores,
                    hyp_tokens, hyp_scores, n_hyps, hyp_len,
                    jnp.arange(b * k))

        def beam_step(_):
            cand = beam_scores[:, None] + logp                 # [B*k, V]
            cand = cand.reshape(b, k * v)
            top_s, top_i = jax.lax.top_k(cand, 2 * k)          # [B, 2k]
            src_beam = top_i // v                              # within-row
            tok = top_i % v
            is_eos = tok == cfg.eos_token_id
            rank = jnp.broadcast_to(jnp.arange(2 * k)[None, :], (b, 2 * k))

            # finalize EOS candidates with rank < k (HF rule), unless the
            # row is already done
            row_done = (n_hyps >= k)[:, None]
            fin = is_eos & (rank < k) & ~row_done
            # sequence length of the finalized hypothesis: pos+2 tokens
            # (prefix..pos plus the eos); HF normalizes by the full hyp len
            hyp_seq_len = (pos + 2).astype(jnp.float32)
            norm = top_s / jnp.power(hyp_seq_len, lp)

            def add_hyps(carry, idx):
                h_tok, h_sc, h_n, h_len = carry
                take = fin[:, idx]
                score = jnp.where(take, norm[:, idx], NEG_INF)
                # replace the worst stored hypothesis when better
                worst = jnp.argmin(h_sc, axis=1)               # [B]
                better = score > h_sc[jnp.arange(b), worst]
                do = take & better
                parent = jnp.arange(b) * k + src_beam[:, idx]
                seq = tokens[parent]                           # [B, total]
                seq = seq.at[:, pos + 1].set(cfg.eos_token_id)
                h_tok = jnp.where(
                    do[:, None, None],
                    h_tok.at[jnp.arange(b), worst].set(seq), h_tok)
                h_sc = jnp.where(
                    do[:, None],
                    h_sc.at[jnp.arange(b), worst].set(score), h_sc)
                h_len = jnp.where(
                    do[:, None],
                    h_len.at[jnp.arange(b), worst]
                    .set(pos + 2 - prefix_len), h_len)
                h_n = h_n + take.astype(jnp.int32)
                return (h_tok, h_sc, h_n, h_len), None

            (h_tok, h_sc, h_n, h_len), _ = jax.lax.scan(
                add_hyps, (hyp_tokens, hyp_scores, n_hyps, hyp_len),
                jnp.arange(2 * k))
            h_n = jnp.minimum(h_n, k)

            # pick the first k non-EOS candidates per row as next beams
            live = ~is_eos
            order = jnp.argsort(                               # stable
                jnp.where(live, rank, 2 * k + rank), axis=1)
            pick = order[:, :k]                                # [B, k]
            pick_rows = jnp.arange(b)[:, None]
            new_scores = top_s[pick_rows, pick]                # [B, k]
            new_tok = tok[pick_rows, pick]
            new_parent = (jnp.arange(b)[:, None] * k
                          + src_beam[pick_rows, pick])         # [B, k]
            # frozen rows keep their beams unchanged
            keep = row_done
            flat_parent = jnp.where(
                keep, jnp.arange(b * k).reshape(b, k), new_parent) \
                .reshape(-1)
            new_tokens = tokens[flat_parent]
            nxt = jnp.where(
                keep, cfg.pad_token_id, new_tok).reshape(-1)
            new_tokens = new_tokens.at[:, pos + 1].set(nxt)
            new_beam_scores = jnp.where(
                keep, beam_scores.reshape(b, k), new_scores).reshape(-1)
            return (new_tokens, new_beam_scores,
                    h_tok, h_sc, h_n, h_len, flat_parent)

        (tokens, beam_scores, hyp_tokens, hyp_scores, n_hyps, hyp_len,
         parent) = jax.lax.cond(in_prefix, prefix_step, beam_step,
                                operand=None)
        # reorder KV cache by parent beam
        cache = jax.tree_util.tree_map(lambda c: c[parent], cache)
        return (pos + 1, tokens, cache, beam_scores,
                hyp_tokens, hyp_scores, n_hyps, hyp_len)

    st = (jnp.int32(0), tokens, cache, beam_scores,
          hyp_tokens, hyp_scores, n_hyps, hyp_len)
    (pos, tokens, cache, beam_scores,
     hyp_tokens, hyp_scores, n_hyps, hyp_len) = jax.lax.while_loop(
        cond, body, st)

    # flush still-running beams for rows without k finished hypotheses
    run_len = (pos + 1 - prefix_len).astype(jnp.float32)
    run_norm = beam_scores.reshape(b, k) / jnp.power(
        (pos + 1).astype(jnp.float32), lp)
    need = hyp_scores <= NEG_INF / 2                          # empty slots
    merged_scores = jnp.where(need, run_norm, hyp_scores)
    merged_tokens = jnp.where(
        need[:, :, None], tokens.reshape(b, k, total), hyp_tokens)
    merged_len = jnp.where(
        need, jnp.int32(run_len), hyp_len)

    best = jnp.argmax(merged_scores, axis=1)
    rows = jnp.arange(b)
    return BeamOut(
        tokens=merged_tokens[rows, best],
        lengths=merged_len[rows, best].astype(jnp.int32),
        scores=merged_scores[rows, best])
