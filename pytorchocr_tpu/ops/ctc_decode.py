"""On-device CTC greedy decode compaction.

The reference decodes on host with a per-timestep Python loop
(rec_postprocess.py:35-59).  At ~18k lines/s device throughput that loop
dominates end-to-end latency, so the collapse happens on device:

  argmax -> keep = (c_t != blank) & (c_t != c_{t-1}) -> scatter kept codes
  to their cumsum positions

One jit emits (codes (N, L) int32 padded with -1, lengths (N,), mean
confidence (N,)); the host only maps code -> char strings.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_len",))
def ctc_greedy_collapse(probs, max_len=64):
    """probs (N, T, C) -> (codes (N, max_len), lengths (N,), conf (N,)).

    codes are vocabulary indices (blank=0 excluded), -1 padded; conf is the
    mean of the per-step max prob over KEPT steps (the reference's
    is_remove_duplicate=True semantics, rec_postprocess.py:78-88: dedup
    first, blanks dropped after — so the first step of each repeated run
    survives unless it is blank).
    """
    idx = jnp.argmax(probs, axis=2).astype(jnp.int32)  # (N, T)
    val = jnp.max(probs, axis=2).astype(jnp.float32)

    prev = jnp.concatenate([jnp.full_like(idx[:, :1], -1), idx[:, :-1]], axis=1)
    keep = (idx != 0) & (idx != prev)  # dedup + blank removal

    positions = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # (N, T)

    def row(codes_row, pos_row, keep_row):
        out = jnp.full((max_len,), -1, jnp.int32)
        # dropped/overflow entries route to index max_len (out of bounds ->
        # silently dropped with mode="drop")
        tgt = jnp.where(keep_row & (pos_row < max_len), pos_row, max_len)
        return out.at[tgt].set(codes_row, mode="drop")

    codes = jax.vmap(row)(idx, positions, keep)
    lengths = jnp.minimum(jnp.sum(keep, axis=1), max_len).astype(jnp.int32)
    conf_sum = jnp.sum(jnp.where(keep, val, 0.0), axis=1)
    conf = jnp.where(lengths > 0, conf_sum / jnp.maximum(lengths, 1), 0.0)
    return codes, lengths, conf
