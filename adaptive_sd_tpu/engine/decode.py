"""Tier execution engine: fused generation graphs + stepwise decode API.

Role parity: the vLLM ``LLM.generate`` engine the reference wraps per stage
(``src/serving/real_model_pipeline.py:89-164``). TPU-first design:

* ``generate`` runs ONE jit-compiled graph per (batch, prompt-bucket,
  max_new) shape bucket: prefill + a ``lax.while_loop`` decode with on-device
  sampling and early exit — zero host round-trips per token, which matters
  doubly here because each dispatch crosses the TPU tunnel (~0.7 ms).
* ``prefill_batch`` / ``decode_batch`` expose single-step graphs for the
  continuous-batching scheduler (engine/scheduler.py), which trades the
  per-step dispatch for cross-request batching.
* The KV cache is donated through every call, so XLA updates pages in place.
* Shape bucketing: batch to powers of two, prompt length to multiples of the
  KV page size — the compile-cache keys (the reference never faces this; XLA
  does, SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field
from types import SimpleNamespace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.exceptions import ResourceError
from ..core.types import ModelOutput
from ..models.config import ModelSpec
from ..models.qwen import decode_step, logits_at, prefill
from ..ops.sampling import sample
from .allocator import PageAllocator
from .kv_cache import PagedKVCache

PAD_ID = 0


def _bucket_batch(b: int) -> int:
    return 1 << max(0, (b - 1).bit_length())


def _bucket_len(s: int, multiple: int) -> int:
    return max(multiple, ((s + multiple - 1) // multiple) * multiple)


def _bucket_pow2(s: int, floor: int, cap: Optional[int] = None) -> int:
    """Geometric length bucket: next power of two >= ``s``, floored at
    ``floor`` and clamped to ``cap`` (rounded up to a ``floor`` multiple).
    Every distinct padded shape is a distinct compiled graph — the serving
    scheduler buckets geometrically so the whole lattice is O(log) graphs
    and can be precompiled at startup (scheduler.warmup), instead of paying
    a mid-serving compile for each new multiple-of-``floor`` length."""
    b = max(floor, 1 << max(s - 1, 0).bit_length())
    if cap is not None:
        b = min(b, _bucket_len(cap, floor))
    return b


_FETCH_PACKERS: dict = {}


def _fetch_host(tree):
    """One-round-trip device->host fetch of a pytree of result arrays.

    ``jax.device_get`` fetches each leaf as its own device->host
    transaction; through the remote-dispatch tunnel every leaf pays a full
    round trip (measured on this rig: a 4-leaf fetch costs ~125x a single
    packed fetch of the same bytes). This helper packs all leaves into ONE
    flat INT32 buffer on device — a tiny jitted concat, cached per
    (structure, shapes, dtypes) so it never recompiles in steady state —
    fetches once, and rebuilds the tree host-side.

    The transport dtype MUST be int32, not f32: float leaves ride as
    bitcast int32 patterns (inert to integer ops), whereas small ints
    bitcast into f32 are DENORMALS, and TPU float pipelines flush denormals
    to zero — measured live on this rig (freshly compiled f32 packers
    zeroed every int32 leaf value below ~2^23 while older cached binaries
    passed them through; token ids and emitted counts all read 0).
    bf16/f16 leaves are promoted to f32 first (value-exact)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if len(leaves) <= 1:
        return jax.device_get(tree)
    # Loud failure outside the supported set: int64/uint32/int8 leaves have
    # no pack rule yet. New call sites must extend the packer (bitcast or
    # widen losslessly) instead of silently casting.
    supported = {"bool", "int32", "float32", "bfloat16", "float16"}
    bad = {str(l.dtype) for l in leaves} - supported
    if bad:
        raise TypeError(
            f"_fetch_host: unsupported leaf dtypes {sorted(bad)}; supported "
            f"{sorted(supported)} (add a lossless pack rule rather than cast)"
        )
    dtypes = tuple(str(l.dtype) for l in leaves)
    shapes = tuple(tuple(l.shape) for l in leaves)
    sig = (treedef, shapes, dtypes)
    packer = _FETCH_PACKERS.get(sig)
    if packer is None:
        def _pack(*xs):
            flat = []
            for x in xs:
                if x.dtype == jnp.bool_:
                    x = x.astype(jnp.int32)
                elif x.dtype != jnp.int32:
                    if x.dtype != jnp.float32:
                        x = x.astype(jnp.float32)
                    x = jax.lax.bitcast_convert_type(x, jnp.int32)
                flat.append(x.reshape(-1))
            return jnp.concatenate(flat)

        packer = _FETCH_PACKERS[sig] = jax.jit(_pack)
    buf = np.asarray(jax.device_get(packer(*leaves)))
    out, off = [], 0
    for shape, dt in zip(shapes, dtypes):
        n = int(np.prod(shape)) if shape else 1
        chunk = buf[off : off + n]
        off += n
        if dt == "bool":
            arr = chunk.astype(bool).reshape(shape)
        elif dt == "int32":
            arr = chunk.reshape(shape)
        else:  # float leaves: restore the f32 bit pattern
            arr = chunk.view(np.float32).reshape(shape)
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)


def _swap_gather_pages(cache: PagedKVCache, idx: jax.Array):
    """Stack the contents of pages ``idx`` across every layer:
    ([L, n_kv, P, page, D] int8, [L, n_kv, P, 1, page] f32) x (K, V).
    Rows of ``idx`` past the live page count point at page 0 — harmless
    reads whose restore twin drops them (out-of-range scatter index)."""
    g = lambda xs: jnp.stack([x[:, idx] for x in xs])  # noqa: E731
    return g(cache.k_pages), g(cache.k_scales), g(cache.v_pages), g(cache.v_scales)


def _swap_scatter_pages(cache: PagedKVCache, idx: jax.Array, kp, ks, vp, vs):
    """Write a gathered page blob back into pages ``idx`` (bit-exact restore
    of _swap_gather_pages). Padding rows carry idx == n_pages and are
    dropped by the scatter, mirroring the cache writers' masking."""

    def s(xs, blob):
        return [x.at[:, idx].set(blob[l], mode="drop") for l, x in enumerate(xs)]

    return PagedKVCache(
        s(cache.k_pages, kp), s(cache.k_scales, ks),
        s(cache.v_pages, vp), s(cache.v_scales, vs),
    )


def _default_fwd(use_pallas: bool, act_quant: bool):
    """Single-device / GSPMD forward triple. The shard_map tensor-parallel
    path (models/qwen_tp.make_tp_forward) provides the same interface, so
    every generation graph below is parallelism-agnostic."""
    from ..models.qwen import prefill_window

    return SimpleNamespace(
        prefill=functools.partial(prefill, use_pallas=use_pallas, act_quant=act_quant),
        decode_step=functools.partial(
            decode_step, use_pallas=use_pallas, act_quant=act_quant
        ),
        logits_at=functools.partial(
            logits_at, use_pallas=use_pallas, act_quant=act_quant
        ),
        prefill_window=functools.partial(
            prefill_window, use_pallas=use_pallas, act_quant=act_quant
        ),
    )


def _decode_loop(params, spec, fwd, *, first, q_cur, q_bufs, seq_lens, cache,
                 block_tables, key, budget, max_new, temperature, top_p,
                 eos_id, return_topk):
    """Shared while-loop decode tail: write sampled tokens (and optional
    top-K support rows) until budget/eos. ``seq_lens`` are the per-row
    context lengths when the first token was sampled."""
    B = seq_lens.shape[0]
    out_toks = jnp.full((B, max_new), PAD_ID, jnp.int32)
    out_lps = jnp.zeros((B, max_new), jnp.float32)
    active = jnp.ones((B,), bool)
    gen_len = jnp.zeros((B,), jnp.int32)

    def cond(state):
        i, _, _, active, *_ = state
        return jnp.logical_and(i < max_new, jnp.any(active))

    def body(state):
        i, tok, q_cur, active, cache, out_toks, out_lps, q_bufs, gen_len, key = state
        writing = jnp.logical_and(active, i < budget)
        out_toks = out_toks.at[:, i].set(jnp.where(writing, tok.token, PAD_ID))
        out_lps = out_lps.at[:, i].set(jnp.where(writing, tok.logprob, 0.0))
        if return_topk:
            qi, qp = q_cur
            q_bufs = (
                q_bufs[0].at[:, i].set(jnp.where(writing[:, None], qi, 0)),
                q_bufs[1].at[:, i].set(jnp.where(writing[:, None], qp, 0.0)),
            )
        gen_len = gen_len + writing.astype(jnp.int32)
        if eos_id is not None:
            active = jnp.logical_and(active, tok.token != eos_id)
        active = jnp.logical_and(active, i + 1 < budget)
        positions = seq_lens + i  # position of the token being fed
        logits, cache = fwd.decode_step(params, spec, tok.token, positions, cache, block_tables)
        key, kk = jax.random.split(key)
        if return_topk:
            from ..ops.sampling import sample_with_topk

            nxt, nqi, nqp = sample_with_topk(
                logits, kk, return_topk, temperature, top_p
            )
            q_cur = (nqi, nqp)
        else:
            nxt = sample(logits, kk, temperature=temperature, top_p=top_p)
        return (i + 1, nxt, q_cur, active, cache, out_toks, out_lps, q_bufs, gen_len, key)

    state = (0, first, q_cur, active, cache, out_toks, out_lps, q_bufs, gen_len, key)
    _, _, _, _, cache, out_toks, out_lps, q_bufs, gen_len, _ = jax.lax.while_loop(
        cond, body, state
    )
    return out_toks, out_lps, gen_len, q_bufs, cache


@dataclass
class GenerationOutput:
    """Per-request generation payload (host side)."""

    token_ids: np.ndarray      # [n] int32
    logprobs: np.ndarray       # [n] float32
    prefill_time_s: float
    decode_time_s: float
    # draft-side sampling distribution support (top-K of the adjusted
    # distribution per generated token) — carried to the next tier's
    # stochastic verifier so escalation preserves the sampling distribution
    # exactly (ops.sampling.speculative_accept). None unless requested.
    topk_ids: Optional[np.ndarray] = None    # [n, K] int32
    topk_probs: Optional[np.ndarray] = None  # [n, K] float32

    @property
    def num_tokens(self) -> int:
        return int(self.token_ids.shape[0])


def _make_generate_fn(spec: ModelSpec, fwd):
    """Fused prefill + while-loop decode. Static over (max_new, temperature,
    top_p, eos_id); traced over token/table/cache shapes."""

    def fn(params, tokens, seq_lens, block_tables, cache, key, budget, *, max_new, temperature, top_p, eos_id, return_topk=0):
        # ``max_new`` is a bucketed static bound (compile-cache key); ``budget``
        # is the request's actual token budget, traced — arbitrary client
        # max_tokens values reuse one graph per bucket instead of recompiling.
        # ``return_topk`` (static) > 0 additionally records the top-K of each
        # step's adjusted sampling distribution — the draft-side support the
        # next tier's stochastic verifier needs for the exact rejection rule.
        B = tokens.shape[0]
        logits, cache = fwd.prefill(params, spec, tokens, seq_lens, cache, block_tables)
        key, k0 = jax.random.split(key)
        if return_topk:
            from ..ops.sampling import sample_with_topk

            first, qi0, qp0 = sample_with_topk(
                logits, k0, return_topk, temperature, top_p
            )
            q_cur = (qi0, qp0)
            q_bufs = (
                jnp.zeros((B, max_new, return_topk), jnp.int32),
                jnp.zeros((B, max_new, return_topk), jnp.float32),
            )
        else:
            first = sample(logits, k0, temperature=temperature, top_p=top_p)
            q_cur, q_bufs = (), ()

        return _decode_loop(
            params, spec, fwd, first=first, q_cur=q_cur, q_bufs=q_bufs,
            seq_lens=seq_lens, cache=cache, block_tables=block_tables, key=key,
            budget=budget, max_new=max_new, temperature=temperature,
            top_p=top_p, eos_id=eos_id, return_topk=return_topk,
        )

    return fn


def _make_generate_cached_fn(spec: ModelSpec, fwd):
    """Prefix-cache-aware generation: the prompt's cached page-aligned
    prefix is SKIPPED — only the suffix window runs through the model
    (models/qwen.prefill_window over the paged prefix) — then the same fused
    while-loop decode. ``offsets`` = per-row reused-prefix lengths."""

    def fn(params, tokens_w, offsets, win_lens, block_tables, cache, key,
           budget, *, max_new, temperature, top_p, eos_id, return_topk=0):
        B = tokens_w.shape[0]
        h, cache = fwd.prefill_window(
            params, spec, tokens_w, offsets, win_lens, cache, block_tables
        )
        last = jnp.take_along_axis(
            h, jnp.maximum(win_lens - 1, 0)[:, None, None], axis=1
        )
        logits = fwd.logits_at(params, spec, last)[:, 0]
        key, k0 = jax.random.split(key)
        if return_topk:
            from ..ops.sampling import sample_with_topk

            first, qi0, qp0 = sample_with_topk(
                logits, k0, return_topk, temperature, top_p
            )
            q_cur = (qi0, qp0)
            q_bufs = (
                jnp.zeros((B, max_new, return_topk), jnp.int32),
                jnp.zeros((B, max_new, return_topk), jnp.float32),
            )
        else:
            first = sample(logits, k0, temperature=temperature, top_p=top_p)
            q_cur, q_bufs = (), ()

        return _decode_loop(
            params, spec, fwd, first=first, q_cur=q_cur, q_bufs=q_bufs,
            seq_lens=offsets + win_lens, cache=cache,
            block_tables=block_tables, key=key, budget=budget,
            max_new=max_new, temperature=temperature, top_p=top_p,
            eos_id=eos_id, return_topk=return_topk,
        )

    return fn


def _make_verify_continue_fn(spec: ModelSpec, fwd):
    """Speculative escalation: ONE prefill over [prompt + draft] verifies the
    draft in parallel (greedy acceptance: longest prefix where this model's
    argmax equals the draft token), emits the model's own token at the first
    mismatch, then a while-loop decodes the remainder. This is what makes
    escalation cost ~(one verify pass + residual decode) instead of a full
    re-decode — the cascade's central performance trick (BASELINE.md north
    star: "draft-generate/batched-verify loop ... fused on-device").
    """

    def fn(
        params,
        tokens,        # [B, S] prompt+draft, right-padded
        prompt_lens,   # [B]
        total_lens,    # [B] prompt + draft lengths
        block_tables,
        cache,
        key,
        budget,        # traced actual token budget (<= max_new bucket)
        draft_q,       # () for greedy verify, or (draft_lp [B,Dw], q_ids
                       # [B,Dw,K], q_probs [B,Dw,K]) — the draft model's own
                       # per-token logprob + top-K support, enabling the
                       # exact stochastic rejection rule at temperature > 0
        offsets,       # [B] reused-prefix lengths (prefix cache). With
                       # ``cached`` static True, ``tokens`` holds only the
                       # WINDOW [prompt-suffix + draft] and the prompt's
                       # cached pages are skipped via prefill_window.
        *,
        max_new,       # static bucketed output-window width
        max_draft,     # static draft-window width
        temperature,
        top_p,
        eos_id,
        return_topk=0, # static; carry this tier's OWN top-K support on the
                       # outputs so a later tier can stochastically verify
                       # them in turn (3+ tier chains stay exact). Emitted
                       # tokens are marginally ~ this tier's adjusted
                       # distribution (the rejection-rule theorem), so q for
                       # the next verifier is top-K of logp_t per slot.
                       # Applies at temperature > 0 on BOTH acceptance paths
                       # (with draft_q: exact; greedy hop: the support still
                       # describes this tier's adjusted distribution).
        cached=False,  # static; prefix-cache mode (see ``offsets``)
    ):
        B, S = tokens.shape
        if cached:
            win_lens = total_lens - offsets
            h, cache = fwd.prefill_window(
                params, spec, tokens, offsets, win_lens, cache, block_tables
            )
        else:
            _, cache, h = fwd.prefill(
                params, spec, tokens, total_lens, cache, block_tables,
                return_hidden=True,
            )
        # Hidden state at position prompt_lens-1+i predicts draft token i.
        # Window of max_draft + 1 positions: index i predicts draft token i;
        # the extra slot (i == draft_len) is the model's own NEXT token when
        # the whole draft is accepted — without it the bonus token would
        # wrongly re-emit the last draft token on full acceptance.
        # In cached mode, h/tokens are window-relative: shift by offsets.
        base = prompt_lens - offsets if cached else prompt_lens
        pos = base[:, None] - 1 + jnp.arange(max_draft + 1)[None, :]
        pos_c = jnp.clip(pos, 0, S - 1)
        h_sel = jnp.take_along_axis(h, pos_c[:, :, None], axis=1)      # [B, Dw+1, H]
        logits_d = fwd.logits_at(params, spec, h_sel)

        draft_idx = jnp.clip(base[:, None] + jnp.arange(max_draft)[None, :], 0, S - 1)
        draft = jnp.take_along_axis(tokens, draft_idx, axis=1)          # [B, Dw]
        draft_len = total_lens - prompt_lens

        if draft_q:
            # Stochastic acceptance: preserves the target model's sampling
            # distribution exactly (ops.sampling.speculative_accept).
            from ..ops.sampling import adjusted_logits, speculative_accept

            dlp_q, q_ids, q_probs = draft_q
            logp_t = jax.nn.log_softmax(
                adjusted_logits(logits_d, temperature, top_p), axis=-1
            )                                                           # [B, Dw+1, V]
            key, ka = jax.random.split(key)
            n_acc, bonus_tok, bonus_lp = speculative_accept(
                ka, draft, dlp_q, q_ids, q_probs, logp_t, draft_len
            )
            draft_lp = jnp.take_along_axis(
                logp_t[:, :max_draft], draft[:, :, None], axis=2
            )[:, :, 0]
            if return_topk:
                w_lp, w_ids = jax.lax.top_k(logp_t, return_topk)  # [B, Dw+1, K]
                w_probs = jnp.exp(w_lp)
        else:
            # Greedy acceptance: longest prefix where this model's argmax
            # equals the draft token (argmax is invariant under the
            # temperature/top_p adjustment, so acceptance is unchanged) —
            # but logprobs, the bonus token, and any carried top-K support
            # must use the tier's OWN adjusted distribution at temperature>0,
            # or downstream consumers (predictor features, a later tier's
            # stochastic verify) see the wrong scale/distribution.
            from ..ops.sampling import adjusted_logits

            stochastic = temperature is not None and temperature > 0.0
            logp_d = jax.nn.log_softmax(
                adjusted_logits(logits_d, temperature, top_p)
                if stochastic else logits_d,
                axis=-1,
            )                                                           # [B, Dw+1, V]
            pred = jnp.argmax(logits_d, axis=-1).astype(jnp.int32)      # [B, Dw+1]
            valid = jnp.arange(max_draft)[None, :] < draft_len[:, None]
            match = jnp.logical_and(pred[:, :max_draft] == draft, valid)
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [B]

            # Verifier's token at the first mismatch (or right after the
            # draft): argmax at temperature 0, a SAMPLE from the adjusted
            # distribution at temperature > 0 (the tier's own sampling
            # semantics — an argmax bonus would bias sampled escalations).
            bonus_pos = n_acc  # in [0, max_draft]; the +1 window makes it valid
            sel_logp = jnp.take_along_axis(
                logp_d, bonus_pos[:, None, None], axis=1
            )[:, 0]                                                     # [B, V]
            if stochastic:
                key, kb = jax.random.split(key)
                bonus_tok = jax.random.categorical(kb, sel_logp).astype(jnp.int32)
            else:
                bonus_tok = jnp.take_along_axis(pred, bonus_pos[:, None], axis=1)[:, 0]
            bonus_lp = jnp.take_along_axis(sel_logp, bonus_tok[:, None], axis=1)[:, 0]
            draft_lp = jnp.take_along_axis(
                logp_d[:, :max_draft], draft[:, :, None], axis=2
            )[:, :, 0]
            if return_topk:
                # carry this tier's own adjusted-distribution support even
                # through a greedy-acceptance hop, so a later tier can run
                # the stochastic rule against the right q (PARITY r1 gap)
                w_lp, w_ids = jax.lax.top_k(logp_d, return_topk)
                w_probs = jnp.exp(w_lp)

        # Output buffer: accepted draft prefix, then the bonus token, then
        # continued decoding. Write index is per-request.
        out_toks = jnp.where(
            jnp.arange(max_new)[None, :] < n_acc[:, None],
            jnp.pad(draft, ((0, 0), (0, max(max_new - max_draft, 0))))[:, :max_new],
            PAD_ID,
        ).astype(jnp.int32)
        out_lps = jnp.where(
            jnp.arange(max_new)[None, :] < n_acc[:, None],
            jnp.pad(draft_lp, ((0, 0), (0, max(max_new - max_draft, 0))))[:, :max_new],
            0.0,
        ).astype(jnp.float32)

        from ..ops.sampling import SampleResult

        first = SampleResult(bonus_tok, bonus_lp)
        if return_topk:
            # window slots j <= n_acc (accepted prefix + bonus) carry the
            # verifier's own adjusted-distribution top-K at that position
            padw = max(max_new - (max_draft + 1), 0)
            wi = jnp.pad(w_ids, ((0, 0), (0, padw), (0, 0)))[:, :max_new]
            wp = jnp.pad(w_probs, ((0, 0), (0, padw), (0, 0)))[:, :max_new]
            in_window = (jnp.arange(max_new)[None, :] <= n_acc[:, None])[..., None]
            q_bufs = (
                jnp.where(in_window, wi, 0).astype(jnp.int32),
                jnp.where(in_window, wp, 0.0).astype(jnp.float32),
            )
            # q support for the bonus token itself (sampled from the residual
            # but marginally ~ p): already covered by slot n_acc above.
            q_cur = ()
        else:
            q_bufs = ()
        active = jnp.ones((B,), bool)
        gen_len = n_acc
        wr = n_acc  # next write slot; bonus goes here

        def cond(state):
            _, active, wr, *_ = state
            return jnp.logical_and(jnp.any(active), jnp.any(wr < budget))

        def body(state):
            tok, active, wr, cache, out_toks, out_lps, q_bufs, gen_len, key = state
            can_write = jnp.logical_and(active, wr < budget)
            wrc = jnp.clip(wr, 0, max_new - 1)
            out_toks = out_toks.at[jnp.arange(B), wrc].set(
                jnp.where(can_write, tok.token, out_toks[jnp.arange(B), wrc])
            )
            out_lps = out_lps.at[jnp.arange(B), wrc].set(
                jnp.where(can_write, tok.logprob, out_lps[jnp.arange(B), wrc])
            )
            gen_len = gen_len + can_write.astype(jnp.int32)
            if eos_id is not None:
                active = jnp.logical_and(active, tok.token != eos_id)
            active = jnp.logical_and(active, wr + 1 < budget)
            positions = prompt_lens + wr  # position of the token being fed
            logits, cache = fwd.decode_step(params, spec, tok.token, positions, cache, block_tables)
            key, kk = jax.random.split(key)
            if return_topk:
                from ..ops.sampling import sample_with_topk

                nxt, nqi, nqp = sample_with_topk(
                    logits, kk, return_topk, temperature, top_p
                )
                # the NEXT loop iteration writes nxt at slot wr+1; stage its
                # q row there now (overwritten only if that write happens)
                qi_b, qp_b = q_bufs
                nwrc = jnp.clip(wr + 1, 0, max_new - 1)
                will_write = jnp.logical_and(active, wr + 1 < budget)[:, None]
                qi_b = qi_b.at[jnp.arange(B), nwrc].set(
                    jnp.where(will_write, nqi, qi_b[jnp.arange(B), nwrc])
                )
                qp_b = qp_b.at[jnp.arange(B), nwrc].set(
                    jnp.where(will_write, nqp, qp_b[jnp.arange(B), nwrc])
                )
                q_bufs = (qi_b, qp_b)
            else:
                nxt = sample(logits, kk, temperature=temperature, top_p=top_p)
            return (nxt, active, wr + 1, cache, out_toks, out_lps, q_bufs, gen_len, key)

        state = (first, active, wr, cache, out_toks, out_lps, q_bufs, gen_len, key)
        _, _, _, cache, out_toks, out_lps, q_bufs, gen_len, _ = jax.lax.while_loop(
            cond, body, state
        )
        return out_toks, out_lps, gen_len, n_acc, q_bufs, cache

    return fn


def _make_verify_admit_fn(spec: ModelSpec, fwd):
    """Verify-only pass for continuous-batching lane admission (scheduler
    escalations): ONE prefill over [prompt + draft] verifies the draft, then
    this tier's own next token is emitted (per-lane temperature) at the first
    rejection — or right after the draft on full acceptance. No decode loop:
    the lane's regular continuous-batching steps decode the remainder, so an
    escalated request shares every subsequent dispatch with the tier's other
    lanes.

    Acceptance rule per row: with ``draft_q`` (the draft tier's per-token
    logprob + top-K support) and temperature > 0, the EXACT stochastic
    rejection rule (ops.sampling.speculative_accept — emitted tokens stay
    distributed as this tier's own sampling); otherwise greedy argmax
    matching (exact at temperature 0).

    ``return_topk`` > 0 additionally returns this tier's own top-K support of
    the per-lane-temperature-adjusted distribution at every draft window slot
    (accepted tokens + bonus), so a later tier can stochastically verify the
    lane's output in turn (exact 3+ tier chains in scheduled mode).

    Rejected draft positions leave stale KV beyond the lane's resume
    position; decode overwrites each such slot before attention can read it
    (reads mask to the current length) — same invariant as the fused
    verify_continue loop above.
    """

    from ..ops.sampling import sample_rows

    def fn(params, tokens, prompt_lens, total_lens, block_tables, cache,
           temps, top_ps, key, draft_q, offsets, *, max_draft, return_topk=0,
           cached=False):
        B, S = tokens.shape
        if cached:
            # prefix-cache mode: ``tokens`` holds only the WINDOW
            # [prompt-suffix + draft]; the prompt's cached pages are skipped
            # via prefill_window and ``offsets`` are the reused lengths.
            win_lens = total_lens - offsets
            h, cache = fwd.prefill_window(
                params, spec, tokens, offsets, win_lens, cache, block_tables
            )
        else:
            _, cache, h = fwd.prefill(
                params, spec, tokens, total_lens, cache, block_tables,
                return_hidden=True,
            )
        # Hidden state at position prompt_lens-1+i predicts draft token i;
        # the +1 window slot is the bonus token on full acceptance.
        # In cached mode h/tokens are window-relative: shift by offsets.
        base = prompt_lens - offsets if cached else prompt_lens
        pos = jnp.clip(
            base[:, None] - 1 + jnp.arange(max_draft + 1)[None, :], 0, S - 1
        )
        h_sel = jnp.take_along_axis(h, pos[:, :, None], axis=1)      # [B, Dw+1, H]
        logits_d = fwd.logits_at(params, spec, h_sel)                # [B, Dw+1, V]
        draft_idx = jnp.clip(
            base[:, None] + jnp.arange(max_draft)[None, :], 0, S - 1
        )
        draft = jnp.take_along_axis(tokens, draft_idx, axis=1)       # [B, Dw]
        draft_len = total_lens - prompt_lens

        # Per-lane-temperature adjusted distribution — used for acceptance
        # logprobs, the carried top-K support, and (stochastic rows) the
        # exact rejection rule. Even GREEDY-accepted rows with temperature>0
        # must be scored under their own temperature: accepted-token
        # logprobs otherwise land on a different scale than lane-decoded
        # tokens (skewing predictor features), and the carried q support
        # would describe the wrong distribution for a later tier's verify
        # (3+ tier chains through a greedy hop would lose exactness).
        from ..ops.sampling import row_adjusted_logits

        stoch = temps > 0.0
        logp_d = jax.nn.log_softmax(
            row_adjusted_logits(logits_d, temps, top_ps), axis=-1
        )
        # greedy acceptance: longest prefix matching this model's argmax
        # (argmax is invariant under the positive temperature scaling)
        pred = jnp.argmax(logits_d, axis=-1).astype(jnp.int32)
        valid = jnp.arange(max_draft)[None, :] < draft_len[:, None]
        match = jnp.logical_and(pred[:, :max_draft] == draft, valid)
        n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        draft_lp = jnp.take_along_axis(
            logp_d[:, :max_draft], draft[:, :, None], axis=2
        )[:, :, 0]
        logp_sel = logp_d

        if draft_q:
            from ..ops.sampling import speculative_accept

            dlp_q, q_ids, q_probs = draft_q
            # the per-lane temperature/top_p adjusted target distribution
            logp_t = logp_d
            key, ka = jax.random.split(key)
            n_acc_s, tok_s, lp_s = speculative_accept(
                ka, draft, dlp_q, q_ids, q_probs, logp_t, draft_len
            )
            n_acc = jnp.where(stoch, n_acc_s, n_acc)

        next_logits = jnp.take_along_axis(logits_d, n_acc[:, None, None], axis=1)[:, 0]
        res = sample_rows(next_logits, key, temps, top_ps=top_ps)
        tok, lp = res.token, res.logprob
        if draft_q:
            # stochastic rows emit the residual/bonus sample from the exact
            # rule instead of an independent re-sample
            tok = jnp.where(stoch, tok_s, tok)
            lp = jnp.where(stoch, lp_s, lp)

        if return_topk:
            w_lp, w_ids = jax.lax.top_k(logp_sel, return_topk)  # [B, Dw+1, K]
            q_out = (w_ids.astype(jnp.int32), jnp.exp(w_lp))
        else:
            q_out = ()
        return n_acc, tok, lp, draft_lp, q_out, cache

    return fn


def _make_decode_scan_fn(spec: ModelSpec, fwd):
    """Multi-step fused decode for the continuous-batching scheduler: run
    ``n_steps`` decode+sample iterations in ONE dispatch (lax.fori_loop),
    emitting per-lane tokens until each lane's remaining budget (or eos) is
    hit. Through the ~0.7 ms/dispatch TPU tunnel this divides the per-token
    dispatch overhead by n_steps; the host syncs lane bookkeeping once per
    scan instead of once per token.

    Lanes that finish mid-scan keep re-feeding their last token at a frozen
    position — the rewrite scatters identical K/V (idempotent) and their
    emissions are masked, so heterogeneous budgets cost no extra dispatches.
    Callers must pre-grow each active lane's pages to cover position +
    n_steps before dispatching.
    """

    from ..ops.sampling import sample_rows, sample_rows_with_topk

    def fn(params, tokens, positions, cache, block_tables, temps, top_ps,
           key, remaining, *, n_steps, eos_id, return_topk=0):
        B = tokens.shape[0]
        out_t = jnp.full((B, n_steps), PAD_ID, jnp.int32)
        out_l = jnp.zeros((B, n_steps), jnp.float32)
        qb = (
            (jnp.zeros((B, n_steps, return_topk), jnp.int32),
             jnp.zeros((B, n_steps, return_topk), jnp.float32))
            if return_topk else ()
        )
        emitted = jnp.zeros((B,), jnp.int32)

        def body(i, state):
            tok, pos, cache, key, rem, emitted, out_t, out_l, qb = state
            active = rem > 0
            logits, cache = fwd.decode_step(
                params, spec, tok, pos, cache, block_tables
            )
            key, kk = jax.random.split(key)
            if return_topk:
                res, qi, qp = sample_rows_with_topk(logits, kk, temps, return_topk,
                                                    top_ps=top_ps)
                qb = (
                    qb[0].at[:, i].set(jnp.where(active[:, None], qi, 0)),
                    qb[1].at[:, i].set(jnp.where(active[:, None], qp, 0.0)),
                )
            else:
                res = sample_rows(logits, kk, temps, top_ps=top_ps)
            out_t = out_t.at[:, i].set(jnp.where(active, res.token, PAD_ID))
            out_l = out_l.at[:, i].set(jnp.where(active, res.logprob, 0.0))
            emitted = emitted + active.astype(jnp.int32)
            rem = rem - active.astype(jnp.int32)
            if eos_id is not None:
                rem = jnp.where(
                    jnp.logical_and(active, res.token == eos_id), 0, rem
                )
            tok = jnp.where(active, res.token, tok)
            pos = pos + active.astype(jnp.int32)
            return (tok, pos, cache, key, rem, emitted, out_t, out_l, qb)

        state = (tokens, positions, cache, key, remaining, emitted, out_t, out_l, qb)
        tok_f, pos_f, cache, key_f, rem_f, emitted, out_t, out_l, qb = (
            jax.lax.fori_loop(0, n_steps, body, state)
        )
        # final lane state: the device-resident carry for chained scans —
        # the scheduler redispatches from these instead of re-uploading
        # host arrays (a fresh host->device transfer costs ~24 ms through
        # the tunnel vs ~12 ms of compute for the whole scan; see
        # scripts/dispatch_probe2.py / DISPATCH_PROBE2.json)
        return out_t, out_l, emitted, qb, (tok_f, pos_f, rem_f, key_f), cache

    return fn


class TierEngine:
    """One cascade tier: quantized params + compiled execution graphs +
    page allocation. Thread-compatible: jit dispatch is GIL-friendly and the
    allocator is locked; callers serialise per-engine generate calls."""

    def __init__(
        self,
        spec: ModelSpec,
        params,
        *,
        name: Optional[str] = None,
        page_size: int = 128,
        n_pages: int = 512,
        use_pallas: bool = True,
        eos_id: Optional[int] = None,
        cost_per_token: float = 1.0,
        donate_cache: bool = True,
        mesh=None,
        act_quant: bool = False,
        enable_prefix_cache: bool = False,
        prefix_spill_bytes: int = 0,
    ) -> None:
        """``mesh``: optional jax Mesh (a disjoint sub-mesh of the pod slice,
        parallel.plan_tier_placements) — cascade tiers co-schedule on
        disjoint device sets (SURVEY.md §2.8). When the mesh has a ``tp``
        axis and the architecture divides across it, the engine takes the
        shard_map tensor-parallel path (models/qwen_tp.py): the whole forward
        runs per-shard — Pallas kernels intact — with one psum per sublayer.
        Otherwise it falls back to plain GSPMD with the jnp kernel path
        (pallas_call cannot be auto-partitioned)."""
        self.spec = spec
        self.name = name or spec.name
        self.page_size = page_size
        self.mesh = mesh
        self.tp_mode = False
        fwd = None
        if mesh is not None:
            from ..parallel.mesh import AXIS_TP

            tp = mesh.shape[AXIS_TP] if AXIS_TP in mesh.axis_names else 1
            total = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            if tp > 1:
                from ..models.qwen_tp import tp_compatible

                self.tp_mode = tp_compatible(spec, params, tp)
            if not self.tp_mode and total > 1:
                use_pallas = False
        self.use_pallas = use_pallas
        self.act_quant = act_quant
        self.eos_id = eos_id
        self.cost_per_token = cost_per_token
        from .native_bridge import make_page_allocator

        self.allocator = make_page_allocator(n_pages)
        cache = PagedKVCache.create(spec, n_pages, page_size)
        if mesh is not None:
            if self.tp_mode:
                from ..models.qwen_tp import (
                    make_tp_forward,
                    prepare_tp_params,
                    shard_cache_tp,
                )

                params = prepare_tp_params(params, spec, mesh)
                cache = shard_cache_tp(cache, mesh)
                fwd = make_tp_forward(
                    spec, mesh, use_pallas=use_pallas, act_quant=act_quant
                )
            else:
                from ..parallel.sharding import shard_cache, shard_params

                params = shard_params(params, spec, mesh)
                cache = shard_cache(cache, spec, mesh)
        if fwd is None:
            fwd = _default_fwd(use_pallas, act_quant)
        self.fwd = fwd
        self.params = params
        self.cache = cache
        self._generate_raw = _make_generate_fn(spec, fwd)
        donate = (4,) if donate_cache else ()
        self._generate_jit = jax.jit(
            self._generate_raw,
            static_argnames=("max_new", "temperature", "top_p", "eos_id", "return_topk"),
            donate_argnums=donate,
        )
        self._verify_raw = _make_verify_continue_fn(spec, fwd)
        self._verify_jit = jax.jit(
            self._verify_raw,
            static_argnames=("max_new", "max_draft", "temperature", "top_p",
                             "eos_id", "return_topk", "cached"),
            donate_argnums=(5,) if donate_cache else (),
        )

        def _generate_policy(params, tokens, seq_lens, block_tables, cache, key, policy,
                             budget, *, max_new, temperature, top_p, eos_id, stage_index,
                             return_topk=0):
            from ..predict.inline import inline_decision

            out_toks, out_lps, gen_len, q_bufs, cache = self._generate_raw(
                params, tokens, seq_lens, block_tables, cache, key, budget,
                max_new=max_new, temperature=temperature, top_p=top_p, eos_id=eos_id,
                return_topk=return_topk,
            )
            escalate, p_hat = inline_decision(policy, out_lps, gen_len, stage_index)
            return out_toks, out_lps, gen_len, q_bufs, escalate, p_hat, cache

        self._generate_policy_jit = jax.jit(
            _generate_policy,
            static_argnames=("max_new", "temperature", "top_p", "eos_id", "stage_index",
                             "return_topk"),
            donate_argnums=(4,) if donate_cache else (),
        )
        self._prefill_jit = jax.jit(
            self._prefill_fn, donate_argnums=(4,) if donate_cache else ()
        )
        self._decode_jit = jax.jit(
            self._decode_fn, donate_argnums=(3,) if donate_cache else ()
        )

        # fused single-step + sample graphs for the continuous-batching
        # scheduler: ONE dispatch per scheduler step (forward + per-lane
        # temperature sampling), one small host fetch (tokens/logprobs)
        from ..ops.sampling import sample_rows, sample_rows_with_topk

        def _prefill_sample(params, tokens, seq_lens, block_tables, cache, temps,
                            top_ps, key, *, return_topk=0):
            logits, cache = fwd.prefill(params, spec, tokens, seq_lens, cache, block_tables)
            if return_topk:
                res, qi, qp = sample_rows_with_topk(logits, key, temps, return_topk,
                                                    top_ps=top_ps)
                return res.token, res.logprob, (qi, qp), cache
            res = sample_rows(logits, key, temps, top_ps=top_ps)
            return res.token, res.logprob, (), cache

        def _decode_sample(params, tokens, positions, cache, block_tables, temps,
                           top_ps, key, *, return_topk=0):
            logits, cache = fwd.decode_step(params, spec, tokens, positions, cache, block_tables)
            if return_topk:
                res, qi, qp = sample_rows_with_topk(logits, key, temps, return_topk,
                                                    top_ps=top_ps)
                return res.token, res.logprob, (qi, qp), cache
            res = sample_rows(logits, key, temps, top_ps=top_ps)
            return res.token, res.logprob, (), cache

        def _prefill_window_sample(params, tokens_w, offsets, win_lens,
                                   block_tables, cache, temps, top_ps, key, *,
                                   return_topk=0):
            # prefix-cache admission: only the uncached suffix window runs
            # through the model; cached prompt pages are attended, not
            # recomputed (scheduler analog of _make_generate_cached_fn)
            h, cache = fwd.prefill_window(
                params, spec, tokens_w, offsets, win_lens, cache, block_tables
            )
            last = jnp.take_along_axis(
                h, jnp.maximum(win_lens - 1, 0)[:, None, None], axis=1
            )
            logits = fwd.logits_at(params, spec, last)[:, 0]
            if return_topk:
                res, qi, qp = sample_rows_with_topk(logits, key, temps, return_topk,
                                                    top_ps=top_ps)
                return res.token, res.logprob, (qi, qp), cache
            res = sample_rows(logits, key, temps, top_ps=top_ps)
            return res.token, res.logprob, (), cache

        self._prefill_sample_jit = jax.jit(
            _prefill_sample, static_argnames=("return_topk",),
            donate_argnums=(4,) if donate_cache else (),
        )
        self._decode_sample_jit = jax.jit(
            _decode_sample, static_argnames=("return_topk",),
            donate_argnums=(3,) if donate_cache else (),
        )
        self._prefill_window_sample_jit = jax.jit(
            _prefill_window_sample, static_argnames=("return_topk",),
            donate_argnums=(5,) if donate_cache else (),
        )
        self._verify_admit_jit = jax.jit(
            _make_verify_admit_fn(spec, fwd),
            static_argnames=("max_draft", "return_topk", "cached"),
            donate_argnums=(5,) if donate_cache else (),
        )
        self._decode_scan_jit = jax.jit(
            _make_decode_scan_fn(spec, fwd),
            static_argnames=("n_steps", "eos_id", "return_topk"),
            donate_argnums=(3,) if donate_cache else (),
        )
        # KV page swap (swap-mode preemption, scheduler): gather page
        # contents to host / scatter them back into a fresh page grant
        self._swap_gather_jit = jax.jit(_swap_gather_pages)
        self._swap_scatter_jit = jax.jit(
            _swap_scatter_pages, donate_argnums=(0,) if donate_cache else ()
        )

        # automatic prefix caching: content-addressed KV-page reuse across
        # requests (engine/prefix_cache.py); generation then prefills only
        # the uncached suffix window — on the single-device/GSPMD path AND
        # the shard_map TP path (qwen_tp prefill_window).
        self.prefix_cache = None
        self._generate_cached_jit = None
        if enable_prefix_cache:
            from .prefix_cache import PrefixCache

            # prefix_spill_bytes > 0: evicted prefix pages spill to host
            # (CPU KV offload) and restore bit-exactly on a chain-intact
            # re-acquire instead of recomputing the prefill
            self.prefix_cache = PrefixCache(
                self.allocator, page_size,
                spill_bytes=prefix_spill_bytes,
                swap_out=self.swap_out_pages,
                swap_in=self.swap_in_pages,
            )
            self._generate_cached_jit = jax.jit(
                _make_generate_cached_fn(spec, fwd),
                static_argnames=("max_new", "temperature", "top_p", "eos_id",
                                 "return_topk"),
                donate_argnums=(5,) if donate_cache else (),
            )
        self.total_generated_tokens = 0
        self.total_decode_time_s = 0.0

    # single-step graphs for the continuous-batching scheduler ---------------
    def _prefill_fn(self, params, tokens, seq_lens, block_tables, cache):
        return self.fwd.prefill(params, self.spec, tokens, seq_lens, cache, block_tables)

    def _decode_fn(self, params, tokens, positions, cache, block_tables):
        return self.fwd.decode_step(params, self.spec, tokens, positions, cache, block_tables)

    def prefill_batch(self, tokens: jax.Array, seq_lens: jax.Array, block_tables: jax.Array):
        logits, self.cache = self._prefill_jit(
            self.params, tokens, seq_lens, block_tables, self.cache
        )
        return logits

    def decode_batch(self, tokens: jax.Array, positions: jax.Array, block_tables: jax.Array):
        logits, self.cache = self._decode_jit(
            self.params, tokens, positions, self.cache, block_tables
        )
        return logits

    def prefill_sample_batch(self, tokens, seq_lens, block_tables, temps, key,
                             *, return_topk=0, top_ps=None):
        """Fused prefill + per-row sample: returns host (tokens [B], logprobs
        [B], q_out) in one dispatch (scheduler admission path). q_out is ()
        or (topk_ids [B, K], topk_probs [B, K]) when ``return_topk`` — the
        per-lane draft support a later tier's stochastic verifier needs.
        ``top_ps`` [B]: per-row nucleus parameter (None = 1.0)."""
        if top_ps is None:
            top_ps = np.ones(len(temps), np.float32)
        tok, lp, q_out, self.cache = self._prefill_sample_jit(
            self.params, jnp.asarray(tokens), jnp.asarray(seq_lens),
            jnp.asarray(block_tables), self.cache, jnp.asarray(temps, jnp.float32),
            jnp.asarray(top_ps, jnp.float32), key, return_topk=return_topk,
        )
        return _fetch_host((tok, lp, q_out))

    def decode_sample_batch(self, tokens, positions, block_tables, temps, key,
                            *, return_topk=0, top_ps=None):
        """Fused decode step + per-row sample (scheduler hot loop): one
        dispatch, one [B]-sized fetch (plus [B, K] support rows when
        ``return_topk``)."""
        if top_ps is None:
            top_ps = np.ones(len(temps), np.float32)
        tok, lp, q_out, self.cache = self._decode_sample_jit(
            self.params, jnp.asarray(tokens), jnp.asarray(positions), self.cache,
            jnp.asarray(block_tables), jnp.asarray(temps, jnp.float32),
            jnp.asarray(top_ps, jnp.float32), key,
            return_topk=return_topk,
        )
        return _fetch_host((tok, lp, q_out))

    def verify_admit_sample_batch(
        self, tokens, prompt_lens, total_lens, block_tables, temps, key, *,
        max_draft, draft_q=(), return_topk=0, offsets=None, top_ps=None,
    ):
        """Scheduler escalation admission: verify [prompt + draft] rows in one
        parallel pass, emit each row's next token at its lane temperature.
        ``draft_q`` = () for greedy acceptance, or (draft_lp [B, Dw], q_ids
        [B, Dw, K], q_probs [B, Dw, K]) for the exact stochastic rule on
        rows with temperature > 0. ``offsets`` (prefix-cache mode): reused
        prompt-prefix lengths — ``tokens`` then holds only the window
        [prompt-suffix + draft]. Returns host (n_accepted [B], next_token
        [B], next_logprob [B], draft_logprobs [B, max_draft], q_out) where
        q_out is () or (topk_ids [B, Dw+1, K'], topk_probs) when
        ``return_topk`` = K' > 0. The KV pages are left filled so the lane
        resumes decoding at prompt_len + n_accepted."""
        dq = tuple(jnp.asarray(a) for a in draft_q) if draft_q else ()
        cached = offsets is not None
        offs = jnp.asarray(
            offsets if cached else np.zeros(len(temps), np.int32)
        )
        if top_ps is None:
            top_ps = np.ones(len(temps), np.float32)
        n_acc, tok, lp, draft_lp, q_out, self.cache = self._verify_admit_jit(
            self.params, jnp.asarray(tokens), jnp.asarray(prompt_lens),
            jnp.asarray(total_lens), jnp.asarray(block_tables), self.cache,
            jnp.asarray(temps, jnp.float32), jnp.asarray(top_ps, jnp.float32),
            key, dq, offs,
            max_draft=max_draft, return_topk=return_topk, cached=cached,
        )
        return _fetch_host((n_acc, tok, lp, draft_lp, q_out))

    def decode_sample_scan(
        self, tokens, positions, block_tables, temps, key, remaining, *,
        n_steps, return_topk=0, top_ps=None,
    ):
        """``n_steps`` fused decode+sample iterations in one dispatch
        (scheduler batch hot loop). ``remaining`` [B]: per-lane emission
        budgets; lanes stop emitting at budget/eos but cost nothing extra.
        Returns host (out_tokens [B, n_steps], out_logprobs [B, n_steps],
        emitted [B], q_out)."""
        if top_ps is None:
            top_ps = np.ones(len(temps), np.float32)
        out_t, out_l, emitted, q_out, _carry, self.cache = self._decode_scan_jit(
            self.params, jnp.asarray(tokens), jnp.asarray(positions), self.cache,
            jnp.asarray(block_tables), jnp.asarray(temps, jnp.float32),
            jnp.asarray(top_ps, jnp.float32), key,
            jnp.asarray(remaining, jnp.int32),
            n_steps=n_steps, eos_id=self.eos_id, return_topk=return_topk,
        )
        return _fetch_host((out_t, out_l, emitted, q_out))

    # ------------------------------------------------- device-carry scanning
    # The tunnel's cost structure (scripts/dispatch_probe2.py): dispatch,
    # sync and result fetch are ~0.05 ms, but EVERY fresh host->device
    # transfer lands with ~24 ms latency. A scheduler that re-uploads lane
    # tokens/positions/budgets/PRNG key each round therefore pays
    # ~24 ms + compute per scan; carrying that state on device drops the
    # steady-state round to pure compute (~12 ms for an 8-step depth-2 scan).
    def scan_carry_init(self, tokens, positions, remaining, temps, top_ps,
                        seed: int):
        """Stage lane state on device for chained scans. One-time (and
        rebuild-after-invalidation) cost: the ~24 ms transfer latency this
        API exists to keep OFF the steady-state path."""
        return {
            "tok": jnp.asarray(np.asarray(tokens, np.int32)),
            "pos": jnp.asarray(np.asarray(positions, np.int32)),
            "rem": jnp.asarray(np.asarray(remaining, np.int32)),
            "key": jax.random.key(seed),
            "temps": jnp.asarray(np.asarray(temps, np.float32)),
            "top_ps": jnp.asarray(np.asarray(top_ps, np.float32)),
        }

    def scan_carry_update(self, carry, lanes, tokens, positions, remaining,
                          temps=None, top_ps=None):
        """Scatter fresh per-lane state (admissions) into a device carry
        without invalidating the untouched lanes. The host scalars ride a
        tiny async transfer whose latency overlaps the next scan's compute."""
        idx = jnp.asarray(np.asarray(lanes, np.int32))
        upd = dict(carry)
        upd["tok"] = carry["tok"].at[idx].set(
            jnp.asarray(np.asarray(tokens, np.int32)))
        upd["pos"] = carry["pos"].at[idx].set(
            jnp.asarray(np.asarray(positions, np.int32)))
        upd["rem"] = carry["rem"].at[idx].set(
            jnp.asarray(np.asarray(remaining, np.int32)))
        if temps is not None:
            upd["temps"] = carry["temps"].at[idx].set(
                jnp.asarray(np.asarray(temps, np.float32)))
        if top_ps is not None:
            upd["top_ps"] = carry["top_ps"].at[idx].set(
                jnp.asarray(np.asarray(top_ps, np.float32)))
        return upd

    def scan_carry_mask(self, carry, lanes):
        """Zero the budgets of ``lanes`` (retired/preempted): the scan graph
        masks rem == 0 lanes, so they can stay in the dispatch harmlessly."""
        idx = jnp.asarray(np.asarray(lanes, np.int32))
        upd = dict(carry)
        upd["rem"] = carry["rem"].at[idx].set(0)
        return upd

    def decode_sample_scan_carry(self, carry, block_tables_dev, *, n_steps,
                                 return_topk=0):
        """One chained scan from a device-resident carry: zero fresh
        host->device transfers on the dispatch path. Returns
        (host (out_tokens, out_logprobs, emitted, q_out), new_carry)."""
        handles, new_carry = self.decode_sample_scan_carry_async(
            carry, block_tables_dev, n_steps=n_steps, return_topk=return_topk
        )
        return _fetch_host(handles), new_carry

    def decode_sample_scan_carry_async(self, carry, block_tables_dev, *,
                                       n_steps, return_topk=0):
        """Dispatch one chained scan WITHOUT fetching: returns (device
        result handles, new_carry). The tunnel pays ~20 ms of enqueue->
        start latency per dispatch (DISPATCH_PROBE3.json) that is hidden
        only while the device stays >= 2 dispatches deep — the scheduler's
        pipelined loop dispatches round N+1 from the carry before fetching
        round N's handles (engine/scheduler.py pipeline_scans)."""
        out_t, out_l, emitted, q_out, fin, self.cache = self._decode_scan_jit(
            self.params, carry["tok"], carry["pos"], self.cache,
            block_tables_dev, carry["temps"], carry["top_ps"], carry["key"],
            carry["rem"],
            n_steps=n_steps, eos_id=self.eos_id, return_topk=return_topk,
        )
        new_carry = dict(carry)
        new_carry["tok"], new_carry["pos"], new_carry["rem"], new_carry["key"] = fin
        return (out_t, out_l, emitted, q_out), new_carry

    @staticmethod
    def fetch_scan_handles(handles):
        """Host-materialise async scan handles (one packed fetch)."""
        return _fetch_host(handles)

    def prefill_window_sample_batch(
        self, tokens_w, offsets, win_lens, block_tables, temps, key, *,
        return_topk=0, top_ps=None,
    ):
        """Prefix-cache admission: prefill only each row's uncached suffix
        window (cached prompt pages are attended through the stitched block
        table) + per-row sample, one dispatch."""
        if top_ps is None:
            top_ps = np.ones(len(temps), np.float32)
        tok, lp, q_out, self.cache = self._prefill_window_sample_jit(
            self.params, jnp.asarray(tokens_w), jnp.asarray(offsets),
            jnp.asarray(win_lens), jnp.asarray(block_tables), self.cache,
            jnp.asarray(temps, jnp.float32), jnp.asarray(top_ps, jnp.float32),
            key, return_topk=return_topk,
        )
        return _fetch_host((tok, lp, q_out))

    # KV page swap (scheduler swap-mode preemption) --------------------------
    def swap_out_pages(self, pages: list) -> tuple:
        """Copy the full contents (K/V int8 + scales, every layer) of
        ``pages`` to host memory. Returns an opaque blob for
        ``swap_in_pages``; the pages themselves may then be freed and
        reused. Page counts bucket to powers of two so repeated swaps reuse
        a handful of compiled gather graphs (role parity: vLLM's SWAP
        preemption, the capability the reference rents — SURVEY.md §2.8)."""
        P = _bucket_pow2(max(len(pages), 1), 2)
        idx = np.zeros((P,), np.int32)
        idx[: len(pages)] = pages
        blob = self._swap_gather_jit(self.cache, jnp.asarray(idx))
        # Slice the padded gather back to the real page count before handing
        # the blob to the caller: callers account blob.nbytes against host
        # swap/spill budgets, and the pow2 padding rows are duplicate copies
        # of page 0 that would both over-charge the budget (up to 2x for a
        # single-page spill) and hold dead host memory. swap_in_pages re-pads
        # before the scatter, so graph bucketing is unaffected.
        n = max(len(pages), 1)
        return tuple(np.asarray(x)[:, :, :n] for x in jax.device_get(blob))

    def swap_in_pages(self, pages: list, blob: tuple) -> None:
        """Restore a ``swap_out_pages`` blob into (freshly granted) device
        pages — bit-exact: the resumed lane's attention reads identical
        quantized KV, so resumption after a swap preemption is numerically
        identical to never having been preempted."""
        n = int(blob[0].shape[2])
        P = _bucket_pow2(n, 2)  # re-pad the compact blob to the graph bucket
        if P > n:
            blob = tuple(
                np.concatenate(
                    [b, np.zeros(b.shape[:2] + (P - n,) + b.shape[3:], b.dtype)],
                    axis=2,
                )
                for b in (np.asarray(x) for x in blob)
            )
        idx = np.full((P,), self.cache.n_pages, np.int32)  # padding: dropped
        idx[: len(pages)] = pages
        self.cache = self._swap_scatter_jit(
            self.cache, jnp.asarray(idx), *(jnp.asarray(b) for b in blob)
        )

    def _acquire_prefixes(self, prompts):
        """Acquire prefix-cache chains for a batch, unwinding earlier
        acquisitions if a later one hits allocator pressure (otherwise their
        refs would leak and pin pages forever)."""
        acqs = []
        try:
            for p in prompts:
                acqs.append(self.prefix_cache.acquire(p))
        except Exception:
            for _, _, held, fill in acqs:
                fk = {k for k, _ in fill}
                self.prefix_cache.invalidate(list(fk))
                self.prefix_cache.release([k for k in held if k not in fk])
            raise
        return acqs

    def _alloc(self, request_id: str, n: int) -> list[int]:
        """allocator.alloc with idle prefix-page reclamation: refcount-0
        cached pages are evicted one at a time under pressure before the
        ResourceError propagates (the scheduler's admission path extends the
        same courtesy, scheduler.py _alloc_admission — direct engine calls
        deserve it too, or a hot prefix cache starves its own engine)."""
        while True:
            try:
                return self.allocator.alloc(request_id, n)
            except ResourceError:
                if self.prefix_cache is None or not self.prefix_cache.evict_one():
                    raise

    # fused offline/bench path ----------------------------------------------
    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        max_new: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        return_topk: int = 0,
    ) -> list[GenerationOutput]:
        """``return_topk`` > 0 (requires temperature > 0) also returns the
        top-K of each step's sampling distribution on the outputs — the
        draft-side support for a later tier's stochastic verify."""
        if return_topk and temperature <= 0.0:
            return_topk = 0  # greedy verify needs no draft distribution
        if self.prefix_cache is not None:
            return self._generate_cached(
                prompts, max_new=max_new, temperature=temperature, top_p=top_p,
                seed=seed, return_topk=return_topk,
            )
        B = len(prompts)
        Bb = _bucket_batch(B)
        lens = [len(p) for p in prompts]
        S = _bucket_len(max(lens), min(64, self.page_size))
        max_new_b = _bucket_len(max_new, 32)  # static graph bound; budget traced
        max_pages = (S + max_new_b + self.page_size - 1) // self.page_size + 1

        tokens = np.full((Bb, S), PAD_ID, np.int32)
        for i, p in enumerate(prompts):
            tokens[i, : len(p)] = np.asarray(p, np.int32)
        seq_lens = np.asarray(lens + [1] * (Bb - B), np.int32)

        rid = f"gen{id(self)}_{time.monotonic_ns()}"
        tables = np.zeros((Bb, max_pages), np.int32)
        try:
            for b in range(Bb):
                tables[b] = self._alloc(f"{rid}_{b}", max_pages)
            t0 = time.perf_counter()
            out_toks, out_lps, gen_len, q_bufs, self.cache = self._generate_jit(
                self.params,
                jnp.asarray(tokens),
                jnp.asarray(seq_lens),
                jnp.asarray(tables),
                self.cache,
                jax.random.key(seed),
                jnp.int32(max_new),
                max_new=max_new_b,
                temperature=temperature,
                top_p=top_p,
                eos_id=self.eos_id,
                return_topk=return_topk,
            )
            out_toks, out_lps, gen_len, q_bufs = _fetch_host(
                (out_toks, out_lps, gen_len, q_bufs)
            )
            dt = time.perf_counter() - t0
        finally:
            for b in range(Bb):
                self.allocator.free_request(f"{rid}_{b}")

        results = []
        for i in range(B):
            n = int(gen_len[i])
            results.append(
                GenerationOutput(
                    token_ids=out_toks[i, :n].copy(),
                    logprobs=out_lps[i, :n].copy(),
                    prefill_time_s=0.0,
                    decode_time_s=dt,
                    topk_ids=q_bufs[0][i, :n].copy() if return_topk else None,
                    topk_probs=q_bufs[1][i, :n].copy() if return_topk else None,
                )
            )
        self.total_generated_tokens += int(gen_len[:B].sum())
        self.total_decode_time_s += dt
        return results

    def _generate_cached(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        max_new: int,
        temperature: float,
        top_p: float,
        seed: int,
        return_topk: int,
    ) -> list[GenerationOutput]:
        """Prefix-cache generation: acquire cached page-aligned prompt
        prefixes, prefill only the suffix windows, decode as usual. Fresh
        full-page chunks written by this call become cached entries."""
        B = len(prompts)
        Bb = _bucket_batch(B)
        page = self.page_size
        lens = [len(p) for p in prompts]
        max_new_b = _bucket_len(max_new, 32)
        max_pages = (max(lens) + max_new_b + page - 1) // page + 1
        oob = self.allocator.n_pages

        acqs = self._acquire_prefixes(prompts)
        offs = [a[1] for a in acqs]
        suffix = [list(p)[o:] for p, o in zip(prompts, offs)]
        Wb = _bucket_len(max(len(sx) for sx in suffix), min(64, page))

        tokens = np.full((Bb, Wb), PAD_ID, np.int32)
        offsets = np.zeros((Bb,), np.int32)
        win_lens = np.ones((Bb,), np.int32)
        tables = np.full((Bb, max_pages), oob, np.int32)
        rid = f"genc{id(self)}_{time.monotonic_ns()}"
        try:
            for i, (sx, (pref_pages, n_reused, _held, _fill)) in enumerate(
                zip(suffix, acqs)
            ):
                tokens[i, : len(sx)] = np.asarray(sx, np.int32)
                offsets[i] = n_reused
                win_lens[i] = len(sx)
                needed = min((lens[i] + max_new_b + page - 1) // page + 1, max_pages)
                own = max(needed - len(pref_pages), 0)
                tables[i, : len(pref_pages)] = pref_pages
                if own:
                    tables[i, len(pref_pages) : len(pref_pages) + own] = (
                        self._alloc(f"{rid}_{i}", own)
                    )
            t0 = time.perf_counter()
            out_toks, out_lps, gen_len, q_bufs, self.cache = self._generate_cached_jit(
                self.params,
                jnp.asarray(tokens),
                jnp.asarray(offsets),
                jnp.asarray(win_lens),
                jnp.asarray(tables),
                self.cache,
                jax.random.key(seed),
                jnp.int32(max_new),
                max_new=max_new_b,
                temperature=temperature,
                top_p=top_p,
                eos_id=self.eos_id,
                return_topk=return_topk,
            )
            out_toks, out_lps, gen_len, q_bufs = _fetch_host(
                (out_toks, out_lps, gen_len, q_bufs)
            )
            dt = time.perf_counter() - t0
        except Exception:
            for _, _, held, fill in acqs:
                self.prefix_cache.invalidate([k for k, _ in fill])
                self.prefix_cache.release([k for k in held if k not in {f for f, _ in fill}])
            raise
        finally:
            for i in range(B):
                self.allocator.free_request(f"{rid}_{i}")
        for _, _, held, _fill in acqs:
            self.prefix_cache.release(held)

        results = []
        for i in range(B):
            n = int(gen_len[i])
            results.append(
                GenerationOutput(
                    token_ids=out_toks[i, :n].copy(),
                    logprobs=out_lps[i, :n].copy(),
                    prefill_time_s=0.0,
                    decode_time_s=dt,
                    topk_ids=q_bufs[0][i, :n].copy() if return_topk else None,
                    topk_probs=q_bufs[1][i, :n].copy() if return_topk else None,
                )
            )
        self.total_generated_tokens += int(gen_len[:B].sum())
        self.total_decode_time_s += dt
        return results

    # streaming ---------------------------------------------------------------
    def stream(
        self,
        prompt: Sequence[int],
        *,
        max_new: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
    ):
        """Token-by-token generator (reference ModelStage.generate_stream
        contract, src/core/interfaces.py:81). Uses the stepwise graphs —
        one dispatch per token is inherent to streaming. Yields
        (token_id, logprob)."""
        S = _bucket_len(len(prompt), min(64, self.page_size))
        max_pages = (S + max_new + self.page_size - 1) // self.page_size + 1
        rid = f"str{id(self)}_{time.monotonic_ns()}"
        pages = self._alloc(rid, max_pages)
        try:
            tokens = np.full((1, S), PAD_ID, np.int32)
            tokens[0, : len(prompt)] = np.asarray(prompt, np.int32)
            tables = jnp.asarray(np.asarray(pages, np.int32)[None, :])
            logits = self.prefill_batch(
                jnp.asarray(tokens), jnp.asarray([len(prompt)], np.int32), tables
            )
            key = jax.random.key(seed)
            pos = len(prompt)
            for step in range(max_new):
                key, kk = jax.random.split(key)
                res = sample(logits, kk, temperature=temperature, top_p=top_p)
                tok = int(res.token[0])
                yield tok, float(res.logprob[0])
                if self.eos_id is not None and tok == self.eos_id:
                    return
                if step == max_new - 1:
                    return
                logits = self.decode_batch(
                    jnp.asarray([tok], np.int32), jnp.asarray([pos], np.int32), tables
                )
                pos += 1
        finally:
            self.allocator.free_request(rid)

    # on-device stopping ------------------------------------------------------
    def generate_with_policy(
        self,
        prompts: Sequence[Sequence[int]],
        policy,                     # predict.inline.InlinePolicyParams
        stage_index: int,
        *,
        max_new: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        return_topk: int = 0,
    ) -> tuple[list[GenerationOutput], np.ndarray, np.ndarray]:
        """Fused draft + inline stopping: the quality predictor and the DP
        rule run INSIDE the generation graph; the escalation flags arrive in
        the same device fetch as the tokens (no host round-trip in the
        decision path). Returns (outputs, escalate[B] bool, p_hat[B])."""
        if return_topk and temperature <= 0.0:
            return_topk = 0
        B = len(prompts)
        Bb = _bucket_batch(B)
        lens = [len(p) for p in prompts]
        S = _bucket_len(max(lens), min(64, self.page_size))
        max_new_b = _bucket_len(max_new, 32)
        max_pages = (S + max_new_b + self.page_size - 1) // self.page_size + 1

        tokens = np.full((Bb, S), PAD_ID, np.int32)
        for i, p in enumerate(prompts):
            tokens[i, : len(p)] = np.asarray(p, np.int32)
        seq_lens = np.asarray(lens + [1] * (Bb - B), np.int32)

        rid = f"pol{id(self)}_{time.monotonic_ns()}"
        tables = np.zeros((Bb, max_pages), np.int32)
        try:
            for b in range(Bb):
                tables[b] = self._alloc(f"{rid}_{b}", max_pages)
            t0 = time.perf_counter()
            out_toks, out_lps, gen_len, q_bufs, escalate, p_hat, self.cache = (
                self._generate_policy_jit(
                    self.params,
                    jnp.asarray(tokens),
                    jnp.asarray(seq_lens),
                    jnp.asarray(tables),
                    self.cache,
                    jax.random.key(seed),
                    policy,
                    jnp.int32(max_new),
                    max_new=max_new_b,
                    temperature=temperature,
                    top_p=top_p,
                    eos_id=self.eos_id,
                    stage_index=stage_index,
                    return_topk=return_topk,
                )
            )
            out_toks, out_lps, gen_len, q_bufs, escalate, p_hat = _fetch_host(
                (out_toks, out_lps, gen_len, q_bufs, escalate, p_hat)
            )
            dt = time.perf_counter() - t0
        finally:
            for b in range(Bb):
                self.allocator.free_request(f"{rid}_{b}")

        results = []
        for i in range(B):
            n = int(gen_len[i])
            results.append(
                GenerationOutput(
                    token_ids=out_toks[i, :n].copy(),
                    logprobs=out_lps[i, :n].copy(),
                    prefill_time_s=0.0,
                    decode_time_s=dt,
                    topk_ids=q_bufs[0][i, :n].copy() if return_topk else None,
                    topk_probs=q_bufs[1][i, :n].copy() if return_topk else None,
                )
            )
        self.total_generated_tokens += int(gen_len[:B].sum())
        self.total_decode_time_s += dt
        return results, escalate[:B], p_hat[:B]

    # speculative escalation --------------------------------------------------
    def verify_continue(
        self,
        prompts: Sequence[Sequence[int]],
        drafts: Sequence[Sequence[int]],
        *,
        max_new: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        draft_q: Optional[Sequence] = None,
        return_topk: int = 0,
    ) -> list[tuple[GenerationOutput, int]]:
        """Escalation entry: verify each draft in one parallel pass, keep the
        accepted prefix, decode the remainder. Returns per request
        (GenerationOutput over the FULL output window, accepted-prefix length).

        ``draft_q``: optional per-request (logprobs [d], topk_ids [d, K],
        topk_probs [d, K]) from the draft tier's ``return_topk`` generation.
        With temperature > 0 and draft_q for every request, verification uses
        the exact stochastic rejection rule (samples remain distributed as
        this tier's own sampling); otherwise greedy argmax acceptance.

        ``return_topk`` (stochastic path only): outputs carry THIS tier's
        top-K support per emitted token, so a later tier can verify them
        stochastically in turn (exact 3+ tier chains).
        """
        if len(prompts) != len(drafts):
            raise ValueError("prompts and drafts must align")
        B = len(prompts)
        Bb = _bucket_batch(B)
        page = self.page_size
        p_lens = [len(p) for p in prompts]
        d_lens = [min(len(d), max_new) for d in drafts]
        max_draft = _bucket_len(max(d_lens), 8)
        max_new_b = _bucket_len(max_new, 32)

        cached = self.prefix_cache is not None
        acqs = self._acquire_prefixes(prompts) if cached else []
        offs = [a[1] for a in acqs] if cached else [0] * B
        # window = [prompt-suffix + draft]; without prefix cache the window
        # is the whole sequence (offsets 0)
        S = _bucket_len(
            max(pl + dl - o for pl, dl, o in zip(p_lens, d_lens, offs)),
            min(64, page),
        )
        max_pages = (
            max(pl + dl for pl, dl in zip(p_lens, d_lens)) + max_new_b + page - 1
        ) // page + 1

        tokens = np.full((Bb, S), PAD_ID, np.int32)
        for i, (pr, d) in enumerate(zip(prompts, drafts)):
            seq = list(pr)[offs[i] :] + list(d)[: d_lens[i]]
            tokens[i, : len(seq)] = np.asarray(seq, np.int32)
        prompt_lens = np.asarray(p_lens + [1] * (Bb - B), np.int32)
        total_lens = np.asarray(
            [pl + dl for pl, dl in zip(p_lens, d_lens)] + [1] * (Bb - B), np.int32
        )
        offsets = np.asarray(offs + [0] * (Bb - B), np.int32)

        dq_args = ()
        if (
            temperature > 0.0
            and draft_q is not None
            and all(q is not None for q in draft_q)
        ):
            K = int(draft_q[0][1].shape[-1])
            dlp = np.zeros((Bb, max_draft), np.float32)
            qids = np.zeros((Bb, max_draft, K), np.int32)
            qpr = np.zeros((Bb, max_draft, K), np.float32)
            for i, (lp, ids, pr) in enumerate(draft_q):
                d = d_lens[i]
                dlp[i, :d] = np.asarray(lp, np.float32)[:d]
                qids[i, :d] = np.asarray(ids, np.int32)[:d]
                qpr[i, :d] = np.asarray(pr, np.float32)[:d]
            dq_args = (jnp.asarray(dlp), jnp.asarray(qids), jnp.asarray(qpr))
        if temperature <= 0.0:
            return_topk = 0  # greedy consumers re-verify greedily; no q needed

        rid = f"ver{id(self)}_{time.monotonic_ns()}"
        tables = np.full((Bb, max_pages), self.allocator.n_pages, np.int32)
        try:
            for b in range(Bb):
                pref = acqs[b][0] if cached and b < B else []
                own = max_pages - len(pref)
                tables[b, : len(pref)] = pref
                if own:
                    tables[b, len(pref) :] = self._alloc(f"{rid}_{b}", own)
            t0 = time.perf_counter()
            out_toks, out_lps, gen_len, n_acc, q_bufs, self.cache = self._verify_jit(
                self.params,
                jnp.asarray(tokens),
                jnp.asarray(prompt_lens),
                jnp.asarray(total_lens),
                jnp.asarray(tables),
                self.cache,
                jax.random.key(seed),
                jnp.int32(max_new),
                dq_args,
                jnp.asarray(offsets),
                max_new=max_new_b,
                max_draft=max_draft,
                temperature=temperature,
                top_p=top_p,
                eos_id=self.eos_id,
                return_topk=return_topk,
                cached=cached,
            )
            out_toks, out_lps, gen_len, n_acc, q_bufs = _fetch_host(
                (out_toks, out_lps, gen_len, n_acc, q_bufs)
            )
            dt = time.perf_counter() - t0
        except Exception:
            if cached:
                for _, _, held, fill in acqs:
                    self.prefix_cache.invalidate([k for k, _ in fill])
                    fkeys = {f for f, _ in fill}
                    self.prefix_cache.release([k for k in held if k not in fkeys])
            raise
        finally:
            for b in range(Bb):
                self.allocator.free_request(f"{rid}_{b}")
        if cached:
            for _, _, held, _fill in acqs:
                self.prefix_cache.release(held)

        results = []
        for i in range(B):
            n = int(gen_len[i])
            results.append(
                (
                    GenerationOutput(
                        token_ids=out_toks[i, :n].copy(),
                        logprobs=out_lps[i, :n].copy(),
                        prefill_time_s=0.0,
                        decode_time_s=dt,
                        topk_ids=q_bufs[0][i, :n].copy() if return_topk else None,
                        topk_probs=q_bufs[1][i, :n].copy() if return_topk else None,
                    ),
                    int(n_acc[i]),
                )
            )
        self.total_generated_tokens += int(gen_len[:B].sum())
        self.total_decode_time_s += dt
        return results

    # ops/info ----------------------------------------------------------------
    def warmup(self, batch: int = 1, prompt_len: int = 16, max_new: int = 8) -> float:
        t0 = time.perf_counter()
        self.generate(
            [[1] * prompt_len for _ in range(batch)], max_new=max_new, temperature=0.0
        )
        return time.perf_counter() - t0

    def memory_usage_bytes(self) -> int:
        params_b = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params)
        )
        return params_b + self.cache.memory_bytes()

    def get_model_info(self) -> dict:
        return {
            "name": self.name,
            "spec": self.spec.name,
            "n_layers": self.spec.n_layers,
            "hidden": self.spec.hidden,
            "approx_params": self.spec.approx_params,
            "page_size": self.page_size,
            "n_pages": self.allocator.n_pages,
            "cost_per_token": self.cost_per_token,
            "memory_bytes": self.memory_usage_bytes(),
            **(
                {"prefix_cache": self.prefix_cache.stats()}
                if self.prefix_cache is not None
                else {}
            ),
        }
