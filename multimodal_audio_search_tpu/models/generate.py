"""Autoregressive generation engine (greedy / sampling / beam) for Whisper.

The reference drives HF ``generate`` with sampling for ASR
(temperature 0.2, no_repeat_ngram 2, repetition_penalty 1.05,
audio_search.py:316-327) and beam-2 for captions (no_repeat_ngram 3,
repetition_penalty 1.3, audio_search.py:366-375). This engine reimplements
those controls TPU-natively:

  * one ``lax.while_loop`` over a fixed-size token buffer and KV cache —
    a single XLA compilation per (batch, max_len) shape, with early exit
    when every sequence has emitted EOS,
  * logits processors (repetition penalty, no-repeat-ngram ban, temperature)
    as pure functions matching HF semantics (parity-tested against
    transformers' LogitsProcessors),
  * greedy is the production path (BASELINE.json north star); sampling and
    beam-2 exist for reference-parity evaluation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig
from .whisper import (
    WhisperConfig, cross_kv, cross_kv_merged, cross_kv_quantized,
    decode_step, init_cache)

NEG_INF = -1e9


# ------------------------------------------------------------ logits rules
def apply_repetition_penalty(
    logits: jnp.ndarray, tokens: jnp.ndarray, valid: jnp.ndarray,
    penalty: float,
) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor semantics.

    For every token id present in the (valid) history: positive scores are
    divided by ``penalty``, negative scores multiplied by it.
    logits [B, V], tokens [B, L], valid [B, L] bool.
    """
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    seen = jnp.zeros((b, v), bool)
    oob = jnp.where(valid, tokens, v)  # route invalid slots to a dummy column
    seen = jnp.zeros((b, v + 1), bool).at[
        jnp.arange(b)[:, None], oob].set(True)[:, :v]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def ban_repeated_ngrams(
    logits: jnp.ndarray, tokens: jnp.ndarray, cur_len: jnp.ndarray, n: int,
) -> jnp.ndarray:
    """HF NoRepeatNGramLogitsProcessor semantics.

    Bans any token that would complete an n-gram already present in the
    history. tokens [B, L] buffer with ``cur_len`` valid entries; the last
    n-1 valid tokens form the probe window.
    """
    if n <= 0:
        return logits
    b, l = tokens.shape
    v = logits.shape[1]
    if n == 1:  # HF semantics: ban every token already generated
        valid = jnp.arange(l)[None, :] < cur_len[:, None]
        oob = jnp.where(valid, tokens, v)
        mask = jnp.zeros((b, v + 1), bool).at[
            jnp.arange(b)[:, None], oob].set(True)[:, :v]
        return jnp.where(mask, NEG_INF, logits)
    # probe window: tokens[cur_len-(n-1) .. cur_len-1], per row
    probe_idx = (cur_len[:, None] - (n - 1)
                 + jnp.arange(n - 1)[None, :])                 # [B, n-1]
    probe = tokens[jnp.arange(b)[:, None],
                   jnp.clip(probe_idx, 0, l - 1)]              # [B, n-1]
    # candidate start positions i: ngram tokens[i..i+n-2], next tokens[i+n-1]
    pos = jnp.arange(l)                                        # starts
    # window at each start: [B, L, n-1]
    win_idx = pos[:, None] + jnp.arange(n - 1)[None, :]        # [L, n-1]
    win = tokens[:, jnp.clip(win_idx, 0, l - 1)]               # [B, L, n-1]
    match = jnp.all(win == probe[:, None, :], axis=-1)         # [B, L]
    # start must satisfy i + n - 1 <= cur_len - 1 (completed ngram in history)
    in_range = (pos[None, :] + n - 1) <= (cur_len[:, None] - 1)
    # only applies once we have a full probe window
    active = (cur_len >= (n - 1))[:, None] & match & in_range
    banned_tok = tokens[:, jnp.clip(win_idx[:, -1] + 1, 0, l - 1)]  # [B, L]
    bi = jnp.where(active, banned_tok, v)                      # dummy col
    mask = jnp.zeros((b, v + 1), bool).at[
        jnp.arange(b)[:, None], bi].set(True)[:, :v]
    return jnp.where(mask, NEG_INF, logits)


# ----------------------------------------------------------------- decoding
def _select_cross_kv(params, enc_out, cfg, decode):
    """Pick the decode cross-attention K/V format (DecodeConfig.cross_attn):
    int8 (memory-saving, opt-in), fused merged-head Pallas kernel (the TPU
    speed path, ops/cross_attention.py), or plain einsum."""
    from ..ops.cross_attention import use_fused_cross_attention
    mode = getattr(decode, "cross_attn", "auto")
    if mode == "int8_fused":
        from .whisper import cross_kv_merged_int8
        return cross_kv_merged_int8(params, enc_out, cfg)
    if decode.int8_cross_kv or mode == "int8":
        return cross_kv_quantized(params, enc_out, cfg)
    if mode == "fused" or (
            mode == "auto"
            and use_fused_cross_attention(enc_out.shape[1],
                                          enc_out.shape[0])):
        return cross_kv_merged(params, enc_out, cfg)
    return cross_kv(params, enc_out, cfg)


class DecodeOut(NamedTuple):
    tokens: jnp.ndarray    # [B, prefix+max_new] int32 (pad after EOS)
    lengths: jnp.ndarray   # [B] int32, generated length incl. EOS
    scores: jnp.ndarray    # [B] float32 summed logprob of generated tokens


def _select_next(logits, method, temperature, key):
    if method == "sample":
        t = jnp.maximum(temperature, 1e-6)
        return jax.random.categorical(key, logits / t, axis=-1)
    return jnp.argmax(logits, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "decode", "prefix_len", "max_new_tokens",
                     "with_scores"))
def generate(
    params,
    enc_out: jnp.ndarray,           # [B, T_enc, d]
    prefix: jnp.ndarray,            # [B, prefix_len] forced decoder prompt
    *,
    cfg: WhisperConfig,
    decode: DecodeConfig,
    prefix_len: int,
    max_new_tokens: int,
    rng: jnp.ndarray | None = None,
    with_scores: bool = False,
) -> DecodeOut:
    """Batched KV-cached generation (greedy or sampling).

    Beam search lives in ``beam_generate``. All shapes static; early-exits
    via the while cond when every row has finished.
    """
    b = enc_out.shape[0]
    total = prefix_len + max_new_tokens
    dtype = enc_out.dtype
    scan_layers = getattr(decode, "scan_layers", False)
    if scan_layers:
        # stacked layouts for the lax.scan layer loop; stacking the
        # block params is a one-time relayout per generate call,
        # amortized over every decode step of the while loop
        from .whisper import (
            cross_kv_merged_stacked, decode_step_scan, init_cache_stacked,
            stack_decoder_blocks)
        ckv = cross_kv_merged_stacked(params, enc_out, cfg)
        cache = init_cache_stacked(cfg, b, total, dtype)
        stacked_blocks = stack_decoder_blocks(params)
    else:
        ckv = _select_cross_kv(params, enc_out, cfg, decode)
        cache = init_cache(cfg, b, total, dtype)
    tokens = jnp.full((b, total), cfg.pad_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prefix.astype(jnp.int32),
                                          (0, 0))
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def cond(state):
        pos, _, _, finished, _, _ = state
        return (pos < total - 1) & ~jnp.all(finished)

    def body(state):
        pos, tokens, cache, finished, scores, key = state
        if scan_layers:
            logits, cache = decode_step_scan(
                params, tokens[:, pos], pos, cache, ckv, cfg,
                stacked_blocks=stacked_blocks,
                fused_layer=getattr(decode, "fused_layer", False) is True)
        else:
            logits, cache = decode_step(
                params, tokens[:, pos], pos, cache, ckv, cfg,
                fused_layer=getattr(decode, "fused_layer", False))
        logits = logits.astype(jnp.float32)
        valid = jnp.arange(total)[None, :] <= pos
        logits = apply_repetition_penalty(
            logits, tokens, valid, decode.repetition_penalty)
        logits = ban_repeated_ngrams(
            logits, tokens, jnp.full((b,), pos + 1),
            decode.no_repeat_ngram_size)
        key, sub = jax.random.split(key)
        nxt = _select_next(logits, decode.method, decode.temperature, sub)
        # during the forced prefix, overwrite with the given ids
        in_prefix = pos + 1 < prefix_len
        forced = tokens[:, jnp.minimum(pos + 1, total - 1)]
        nxt = jnp.where(in_prefix, forced, nxt.astype(jnp.int32))
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        if with_scores:  # full-vocab log-softmax costs ~0.3 ms/step at B=64
            logprob = jax.nn.log_softmax(logits, axis=-1)[
                jnp.arange(b), nxt]
            scores = scores + jnp.where(finished | in_prefix, 0.0, logprob)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, pos + 1))
        finished = finished | (~in_prefix & (nxt == cfg.eos_token_id))
        return (pos + 1, tokens, cache, finished, scores, key)

    init = (jnp.int32(0), tokens, cache,
            jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32), rng)
    pos, tokens, _, finished, scores, _ = jax.lax.while_loop(cond, body, init)
    # generated length = first EOS (inclusive) or max_new
    gen = tokens[:, prefix_len:]
    is_eos = gen == cfg.eos_token_id
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos + 1, max_new_tokens)
    return DecodeOut(tokens=tokens, lengths=lengths.astype(jnp.int32),
                     scores=scores)
