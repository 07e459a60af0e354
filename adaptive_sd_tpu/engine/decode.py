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
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

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


@dataclass
class GenerationOutput:
    """Per-request generation payload (host side)."""

    token_ids: np.ndarray      # [n] int32
    logprobs: np.ndarray       # [n] float32
    prefill_time_s: float
    decode_time_s: float

    @property
    def num_tokens(self) -> int:
        return int(self.token_ids.shape[0])


def _make_generate_fn(spec: ModelSpec, use_pallas: bool, act_quant: bool = False):
    """Fused prefill + while-loop decode. Static over (max_new, temperature,
    top_p, eos_id); traced over token/table/cache shapes."""

    def fn(params, tokens, seq_lens, block_tables, cache, key, budget, *, max_new, temperature, top_p, eos_id):
        # ``max_new`` is a bucketed static bound (compile-cache key); ``budget``
        # is the request's actual token budget, traced — arbitrary client
        # max_tokens values reuse one graph per bucket instead of recompiling.
        B = tokens.shape[0]
        logits, cache = prefill(
            params, spec, tokens, seq_lens, cache, block_tables,
            use_pallas=use_pallas, act_quant=act_quant,
        )
        key, k0 = jax.random.split(key)
        first = sample(logits, k0, temperature=temperature, top_p=top_p)

        out_toks = jnp.full((B, max_new), PAD_ID, jnp.int32)
        out_lps = jnp.zeros((B, max_new), jnp.float32)
        active = jnp.ones((B,), bool)
        gen_len = jnp.zeros((B,), jnp.int32)

        def cond(state):
            i, _, active, *_ = state
            return jnp.logical_and(i < max_new, jnp.any(active))

        def body(state):
            i, tok, active, cache, out_toks, out_lps, gen_len, key = state
            writing = jnp.logical_and(active, i < budget)
            out_toks = out_toks.at[:, i].set(jnp.where(writing, tok.token, PAD_ID))
            out_lps = out_lps.at[:, i].set(jnp.where(writing, tok.logprob, 0.0))
            gen_len = gen_len + writing.astype(jnp.int32)
            if eos_id is not None:
                active = jnp.logical_and(active, tok.token != eos_id)
            active = jnp.logical_and(active, i + 1 < budget)
            positions = seq_lens + i  # position of the token being fed
            logits, cache = decode_step(
                params, spec, tok.token, positions, cache, block_tables,
                use_pallas=use_pallas, act_quant=act_quant,
            )
            key, kk = jax.random.split(key)
            nxt = sample(logits, kk, temperature=temperature, top_p=top_p)
            return (i + 1, nxt, active, cache, out_toks, out_lps, gen_len, key)

        state = (0, first, active, cache, out_toks, out_lps, gen_len, key)
        _, _, _, cache, out_toks, out_lps, gen_len, _ = jax.lax.while_loop(cond, body, state)
        return out_toks, out_lps, gen_len, cache

    return fn


def _make_verify_continue_fn(spec: ModelSpec, use_pallas: bool, act_quant: bool = False):
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
        *,
        max_new,       # static bucketed output-window width
        max_draft,     # static draft-window width
        temperature,
        top_p,
        eos_id,
    ):
        B, S = tokens.shape
        _, cache, h = prefill(
            params, spec, tokens, total_lens, cache, block_tables,
            use_pallas=use_pallas, act_quant=act_quant, return_hidden=True,
        )
        # Hidden state at position prompt_lens-1+i predicts draft token i.
        # Window of max_draft + 1 positions: index i predicts draft token i;
        # the extra slot (i == draft_len) is the model's own NEXT token when
        # the whole draft is accepted — without it the bonus token would
        # wrongly re-emit the last draft token on full acceptance.
        pos = prompt_lens[:, None] - 1 + jnp.arange(max_draft + 1)[None, :]
        pos_c = jnp.clip(pos, 0, S - 1)
        h_sel = jnp.take_along_axis(h, pos_c[:, :, None], axis=1)      # [B, Dw+1, H]
        logits_d = logits_at(params, spec, h_sel, use_pallas=use_pallas, act_quant=act_quant)
        logp_d = jax.nn.log_softmax(logits_d, axis=-1)                  # [B, Dw+1, V]
        pred = jnp.argmax(logits_d, axis=-1).astype(jnp.int32)          # [B, Dw+1]

        draft_idx = jnp.clip(prompt_lens[:, None] + jnp.arange(max_draft)[None, :], 0, S - 1)
        draft = jnp.take_along_axis(tokens, draft_idx, axis=1)          # [B, Dw]
        draft_len = total_lens - prompt_lens
        valid = jnp.arange(max_draft)[None, :] < draft_len[:, None]
        match = jnp.logical_and(pred[:, :max_draft] == draft, valid)
        n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [B]

        # Verifier's token at the first mismatch (or right after the draft).
        bonus_pos = n_acc  # in [0, max_draft]; the +1 window makes it valid
        bonus_tok = jnp.take_along_axis(pred, bonus_pos[:, None], axis=1)[:, 0]
        bonus_lp = jnp.take_along_axis(
            jnp.take_along_axis(logp_d, bonus_pos[:, None, None], axis=1)[:, 0],
            bonus_tok[:, None],
            axis=1,
        )[:, 0]
        draft_lp = jnp.take_along_axis(
            logp_d[:, :max_draft], draft[:, :, None], axis=2
        )[:, :, 0]

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
        active = jnp.ones((B,), bool)
        gen_len = n_acc
        wr = n_acc  # next write slot; bonus goes here

        def cond(state):
            _, active, wr, *_ = state
            return jnp.logical_and(jnp.any(active), jnp.any(wr < budget))

        def body(state):
            tok, active, wr, cache, out_toks, out_lps, gen_len, key = state
            can_write = jnp.logical_and(active, wr < budget)
            out_toks = out_toks.at[jnp.arange(B), jnp.clip(wr, 0, max_new - 1)].set(
                jnp.where(can_write, tok.token, out_toks[jnp.arange(B), jnp.clip(wr, 0, max_new - 1)])
            )
            out_lps = out_lps.at[jnp.arange(B), jnp.clip(wr, 0, max_new - 1)].set(
                jnp.where(can_write, tok.logprob, out_lps[jnp.arange(B), jnp.clip(wr, 0, max_new - 1)])
            )
            gen_len = gen_len + can_write.astype(jnp.int32)
            if eos_id is not None:
                active = jnp.logical_and(active, tok.token != eos_id)
            active = jnp.logical_and(active, wr + 1 < budget)
            positions = prompt_lens + wr  # position of the token being fed
            logits, cache = decode_step(
                params, spec, tok.token, positions, cache, block_tables,
                use_pallas=use_pallas, act_quant=act_quant,
            )
            key, kk = jax.random.split(key)
            nxt = sample(logits, kk, temperature=temperature, top_p=top_p)
            return (nxt, active, wr + 1, cache, out_toks, out_lps, gen_len, key)

        state = (first, active, wr, cache, out_toks, out_lps, gen_len, key)
        _, _, _, cache, out_toks, out_lps, gen_len, _ = jax.lax.while_loop(cond, body, state)
        return out_toks, out_lps, gen_len, n_acc, cache

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
    ) -> None:
        """``mesh``: optional jax Mesh (a disjoint sub-mesh of the pod slice,
        parallel.plan_tier_placements) — params and KV pages are GSPMD-
        sharded onto it and every graph runs on those devices only, so
        cascade tiers co-schedule on disjoint device sets (SURVEY.md §2.8).
        Multi-device meshes currently run the jnp kernel path
        (use_pallas=False); per-shard Pallas via shard_map is future work."""
        self.spec = spec
        self.name = name or spec.name
        self.page_size = page_size
        self.mesh = mesh
        if mesh is not None and np.prod([mesh.shape[a] for a in mesh.axis_names]) > 1:
            use_pallas = False
        self.use_pallas = use_pallas
        self.act_quant = act_quant
        self.eos_id = eos_id
        self.cost_per_token = cost_per_token
        from .native_bridge import make_page_allocator

        self.allocator = make_page_allocator(n_pages)
        cache = PagedKVCache.create(spec, n_pages, page_size)
        if mesh is not None:
            from ..parallel.sharding import shard_cache, shard_params

            params = shard_params(params, spec, mesh)
            cache = shard_cache(cache, spec, mesh)
        self.params = params
        self.cache = cache
        self._generate_raw = _make_generate_fn(spec, use_pallas, act_quant)
        donate = (4,) if donate_cache else ()
        self._generate_jit = jax.jit(
            self._generate_raw,
            static_argnames=("max_new", "temperature", "top_p", "eos_id"),
            donate_argnums=donate,
        )
        self._verify_raw = _make_verify_continue_fn(spec, use_pallas, act_quant)
        self._verify_jit = jax.jit(
            self._verify_raw,
            static_argnames=("max_new", "max_draft", "temperature", "top_p", "eos_id"),
            donate_argnums=(5,) if donate_cache else (),
        )

        def _generate_policy(params, tokens, seq_lens, block_tables, cache, key, policy,
                             budget, *, max_new, temperature, top_p, eos_id, stage_index):
            from ..predict.inline import inline_decision

            out_toks, out_lps, gen_len, cache = self._generate_raw(
                params, tokens, seq_lens, block_tables, cache, key, budget,
                max_new=max_new, temperature=temperature, top_p=top_p, eos_id=eos_id,
            )
            escalate, p_hat = inline_decision(policy, out_lps, gen_len, stage_index)
            return out_toks, out_lps, gen_len, escalate, p_hat, cache

        self._generate_policy_jit = jax.jit(
            _generate_policy,
            static_argnames=("max_new", "temperature", "top_p", "eos_id", "stage_index"),
            donate_argnums=(4,) if donate_cache else (),
        )
        self._prefill_jit = jax.jit(
            self._prefill_fn, donate_argnums=(4,) if donate_cache else ()
        )
        self._decode_jit = jax.jit(
            self._decode_fn, donate_argnums=(3,) if donate_cache else ()
        )
        self.total_generated_tokens = 0
        self.total_decode_time_s = 0.0

    # single-step graphs for the continuous-batching scheduler ---------------
    def _prefill_fn(self, params, tokens, seq_lens, block_tables, cache):
        return prefill(
            params, self.spec, tokens, seq_lens, cache, block_tables,
            use_pallas=self.use_pallas, act_quant=self.act_quant,
        )

    def _decode_fn(self, params, tokens, positions, cache, block_tables):
        return decode_step(
            params, self.spec, tokens, positions, cache, block_tables,
            use_pallas=self.use_pallas, act_quant=self.act_quant,
        )

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

    # fused offline/bench path ----------------------------------------------
    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        max_new: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
    ) -> list[GenerationOutput]:
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
                tables[b] = self.allocator.alloc(f"{rid}_{b}", max_pages)
            t0 = time.perf_counter()
            out_toks, out_lps, gen_len, self.cache = self._generate_jit(
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
            )
            out_toks, out_lps, gen_len = jax.device_get((out_toks, out_lps, gen_len))
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
        pages = self.allocator.alloc(rid, max_pages)
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
    ) -> tuple[list[GenerationOutput], np.ndarray, np.ndarray]:
        """Fused draft + inline stopping: the quality predictor and the DP
        rule run INSIDE the generation graph; the escalation flags arrive in
        the same device fetch as the tokens (no host round-trip in the
        decision path). Returns (outputs, escalate[B] bool, p_hat[B])."""
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
                tables[b] = self.allocator.alloc(f"{rid}_{b}", max_pages)
            t0 = time.perf_counter()
            out_toks, out_lps, gen_len, escalate, p_hat, self.cache = (
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
                )
            )
            out_toks, out_lps, gen_len, escalate, p_hat = jax.device_get(
                (out_toks, out_lps, gen_len, escalate, p_hat)
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
    ) -> list[tuple[GenerationOutput, int]]:
        """Escalation entry: verify each draft in one parallel pass, keep the
        accepted prefix, decode the remainder. Returns per request
        (GenerationOutput over the FULL output window, accepted-prefix length).
        """
        if len(prompts) != len(drafts):
            raise ValueError("prompts and drafts must align")
        B = len(prompts)
        Bb = _bucket_batch(B)
        p_lens = [len(p) for p in prompts]
        d_lens = [min(len(d), max_new) for d in drafts]
        max_draft = _bucket_len(max(d_lens), 8)
        S = _bucket_len(
            max(pl + dl for pl, dl in zip(p_lens, d_lens)), min(64, self.page_size)
        )
        max_new_b = _bucket_len(max_new, 32)
        max_pages = (S + max_new_b + self.page_size - 1) // self.page_size + 1

        tokens = np.full((Bb, S), PAD_ID, np.int32)
        for i, (p, d) in enumerate(zip(prompts, drafts)):
            seq = list(p) + list(d)[: d_lens[i]]
            tokens[i, : len(seq)] = np.asarray(seq, np.int32)
        prompt_lens = np.asarray(p_lens + [1] * (Bb - B), np.int32)
        total_lens = np.asarray(
            [pl + dl for pl, dl in zip(p_lens, d_lens)] + [1] * (Bb - B), np.int32
        )

        rid = f"ver{id(self)}_{time.monotonic_ns()}"
        tables = np.zeros((Bb, max_pages), np.int32)
        try:
            for b in range(Bb):
                tables[b] = self.allocator.alloc(f"{rid}_{b}", max_pages)
            t0 = time.perf_counter()
            out_toks, out_lps, gen_len, n_acc, self.cache = self._verify_jit(
                self.params,
                jnp.asarray(tokens),
                jnp.asarray(prompt_lens),
                jnp.asarray(total_lens),
                jnp.asarray(tables),
                self.cache,
                jax.random.key(seed),
                jnp.int32(max_new),
                max_new=max_new_b,
                max_draft=max_draft,
                temperature=temperature,
                top_p=top_p,
                eos_id=self.eos_id,
            )
            out_toks, out_lps, gen_len, n_acc = jax.device_get(
                (out_toks, out_lps, gen_len, n_acc)
            )
            dt = time.perf_counter() - t0
        finally:
            for b in range(Bb):
                self.allocator.free_request(f"{rid}_{b}")

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
        }
