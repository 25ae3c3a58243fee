"""Paged KV cache + paged continuous-batching scheduler.

vLLM-style memory management on TPU: the KV cache is a global pool of
fixed-size pages (L, NPAGES, Hkv, page, D); each request owns just the pages
its tokens occupy, so HBM scales with live tokens instead of
slots × max_len. Attention walks the page table inside the Pallas kernel
(kernels/paged_decode.py) — the gather never materializes.

No reference equivalent (the reference decodes one request at a time through
HF's contiguous cache).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import LLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import generate as gen
from callireader_tpu.runtime.serving import PrefixCacheMixin, Request


class PagePool:
    """Host-side page allocator over the device pools."""

    def __init__(self, num_pages: int):
        # page 0 is reserved as the trash page: inactive decode slots write
        # their garbage token there instead of corrupting live pages
        self.free = list(range(num_pages - 1, 0, -1))

    def alloc(self, n: int) -> List[int]:
        if len(self.free) < n:
            raise MemoryError(f"page pool exhausted (need {n}, have {len(self.free)})")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: List[int]) -> None:
        self.free.extend(pages)


@dataclasses.dataclass
class _Slot:
    req: Request
    pages: List[int]
    start: int      # first valid token offset inside the first page region
    length: int     # absolute token count written (incl. left pad region)
    seq: int = 0    # admission order — preemption picks the youngest (max)


class PagedBatcher(PrefixCacheMixin):
    """Continuous batching over the paged pool.

    Same scheduling contract as runtime/serving.ContinuousBatcher, but a slot
    holds only as many pages as its tokens need (bucketed prompt + generation
    growth), and pages return to the pool the moment a request finishes.
    Supports the prefix KV cache (PrefixCacheMixin): hits prefill only their
    suffix; the prefix KV is copied into the request's own pages (no page
    sharing — the copy is HBM-cheap and keeps decode-write invariants).
    """

    def __init__(
        self,
        llm_params: Dict[str, Any],
        cfg: LLMConfig,
        *,
        num_slots: int = 8,
        num_pages: int = 256,
        page_size: int = 128,
        max_pages_per_slot: int = 32,
        policy: DTypePolicy = DEFAULT_POLICY,
        use_flash: Optional[bool] = None,
        cache_dtype=jnp.bfloat16,
        interpret: bool = False,
        steps_per_sync: int = 1,
        mesh=None,
        alloc_watermark: Optional[int] = None,
    ):
        self.params = llm_params
        self.cfg = cfg
        self.B = num_slots
        self.page = page_size
        self.P = max_pages_per_slot
        self.policy = policy
        self.use_flash = use_flash
        self.interpret = interpret
        self.mesh = mesh
        # >1: k decode+pick steps per host tick in one on-device scan (valid
        # windows / write targets derived on device from lengths+page_table)
        self.steps_per_sync = max(1, steps_per_sync)
        # first window after admit writes at bucket..bucket+k-1; the page
        # rounding of the prompt bucket guarantees >= page_size headroom
        assert self.steps_per_sync <= page_size, "steps_per_sync must be <= page_size"

        self._pending: List[Optional[int]] = [None] * num_slots
        L, Hkv, D = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
        pool_shape = (L, num_pages, Hkv, page_size, D)
        if mesh is not None:
            # sharded page pools: kv-heads over the tensor axis (see
            # runtime/serving.py) — page bookkeeping is head-oblivious, so the
            # allocator is unchanged
            from jax.sharding import NamedSharding

            from callireader_tpu.core import partition as part

            spec = part.spec_for_shape(
                pool_shape, (None, None, "kv_heads", None, None), mesh=mesh
            )
            kv_sh = NamedSharding(mesh, spec)
            self.kpool = jax.device_put(jnp.zeros(pool_shape, cache_dtype), kv_sh)
            self.vpool = jax.device_put(jnp.zeros(pool_shape, cache_dtype), kv_sh)
        else:
            self.kpool = jnp.zeros(pool_shape, cache_dtype)
            self.vpool = jnp.zeros(pool_shape, cache_dtype)
        self.pool = PagePool(num_pages)
        self.slots: List[Optional[_Slot]] = [None] * num_slots
        self.last_logits = jnp.zeros((num_slots, cfg.vocab_size), jnp.float32)
        self.queue: List[Request] = []
        self.done: List[Request] = []
        # pages are allocated LAZILY: admission takes only the prompt's pages
        # and decode growth allocates one page at a time, so HBM really does
        # scale with live tokens (not with max_new_tokens worst cases). The
        # watermark keeps a small reserve out of admission's reach so running
        # decodes can grow before preemption kicks in (vLLM's 1% watermark).
        self.watermark = num_slots if alloc_watermark is None else alloc_watermark
        self.n_preempted = 0
        self._admit_seq = 0
        # folds a preempted request's generated ids back into prompt embeds
        # (float32 — prefill casts to compute dtype, so replay matches decode)
        self._embed_rows = jax.jit(
            lambda p, ids: internlm2.embed_tokens(p, ids, jnp.float32)
        )

        from callireader_tpu.runtime.serving import _penalize, _pick_tokens

        self.seen = jnp.zeros((num_slots, cfg.vocab_size), jnp.bool_)
        self._pick = jax.jit(_pick_tokens, donate_argnums=(1,))
        # post-prefill seed pick for windowed mode: same repetition-penalty
        # semantics as _pick_tokens against the slot's (re-marked) seen row —
        # a raw argmax would diverge from the uncontended run for resumed
        # requests with penalty != 1.0. seen marking of the picked token
        # happens when _step_windowed consumes the pending ref.
        self._pick_seed = jax.jit(
            lambda lg, seen_row, pen: jnp.argmax(
                _penalize(lg[None], seen_row[None], pen[None])[0]
            ).astype(jnp.int32)
        )
        self._clear_seen = jax.jit(
            lambda seen, slot: seen.at[slot].set(False), donate_argnums=(0,)
        )
        self._prefill_cache: Dict[int, Callable] = {}
        self._insert_page = jax.jit(self._insert_page_impl, donate_argnums=(1,))
        self._insert_pages = jax.jit(self._insert_pages_impl, donate_argnums=(1,))
        self._decode = jax.jit(self._decode_impl)
        self._decode_k = jax.jit(self._decode_k_impl, donate_argnums=(2, 3, 7),
                                 static_argnums=(8,))
        self._init_prefix_cache()

    @property
    def _cache_dtype(self):
        return self.kpool.dtype

    def _prefix_prefill_max_len(self, bucket: int) -> int:
        return bucket  # _insert_pages consumes exactly the bucket region

    def _prefix_capacity(self) -> int:
        return self.P * self.page

    # ------------------------------------------------------------------

    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefill_cache:
            self._prefill_cache[bucket] = jax.jit(
                lambda p, e, m: internlm2.prefill(
                    p, self.cfg, inputs_embeds=e, attention_mask=m, max_len=bucket,
                    policy=self.policy, use_flash=self.use_flash,
                    cache_dtype=self.kpool.dtype, mesh=self.mesh,
                )
            )
        return self._prefill_cache[bucket]

    def _insert_page_impl(self, src, pool, page_id):
        # src (L, Hkv, page, D) -> pool[:, page_id]
        return jax.lax.dynamic_update_slice(
            pool, src[:, None], (0, page_id, 0, 0, 0)
        )

    def _insert_pages_impl(self, cache, pool, page_ids):
        # cache (L, 1, Hkv, n*page, D) -> pool[:, page_ids[i]] for each of the
        # n page-sized windows, in ONE dispatch (per-page dispatches cost one
        # RPC each on a tunneled device)
        L, _, Hkv, S, D = cache.shape
        n = S // self.page
        src = cache[:, 0].reshape(L, Hkv, n, self.page, D).transpose(0, 2, 1, 3, 4)
        return pool.at[:, page_ids].set(src.astype(pool.dtype))

    def _decode_impl(self, params, ids, kpool, vpool, page_table, valid, write_page, write_off, positions):
        """One decode step over all slots; k/v for the new token are computed
        by a multislot-style layer scan that writes into (page, offset)."""
        from callireader_tpu.kernels.decode_attention import flash_decode  # noqa: F401 (fallback path)
        from callireader_tpu.kernels.paged_decode import paged_flash_decode

        cfg = self.cfg
        policy = self.policy
        x = internlm2.embed_tokens(params, ids, policy.compute_dtype)
        B, S, _ = x.shape
        cos, sin = internlm2.cos_sin_for(cfg, positions, self.P * self.page)
        batch_idx = jnp.arange(B)

        def body(carry, p):
            x, kpool, vpool, idx = carry
            h = internlm2.rms_norm(x, p["attn_norm"], cfg.rms_norm_eps, policy)
            q, k, v = internlm2._qkv(p, h, cfg)
            q = internlm2.apply_rope(q, cos, sin)
            k = internlm2.apply_rope(k, cos, sin)
            # write the new token into (layer idx, page, offset) per slot
            kpool = kpool.at[idx, write_page, :, write_off, :].set(
                k[batch_idx, :, 0, :].astype(kpool.dtype)
            )
            vpool = vpool.at[idx, write_page, :, write_off, :].set(
                v[batch_idx, :, 0, :].astype(vpool.dtype)
            )
            use_pallas = self.interpret or (
                self.page % 128 == 0  # Mosaic lane rule on the valid mask
                and (
                    self.use_flash
                    if self.use_flash is not None
                    else jax.devices()[0].platform == "tpu"
                )
            )
            if use_pallas:
                from callireader_tpu.parallel.tp_attention import (
                    paged_flash_decode_tp, tp_active,
                )

                if tp_active(self.mesh):
                    ctx = paged_flash_decode_tp(
                        q, kpool, vpool, idx, page_table, valid, self.mesh,
                        interpret=self.interpret,
                    )
                else:
                    ctx = paged_flash_decode(
                        q, kpool, vpool, idx, page_table, valid, interpret=self.interpret
                    )
            else:
                ctx = self._xla_paged_attention(q, kpool, vpool, idx, page_table, valid)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, -1)
            x = x + internlm2._proj(p, ctx, "wo")
            x = internlm2._mlp(p, x, cfg, policy)
            return (x, kpool, vpool, idx + 1), None

        (x, kpool, vpool, _), _ = jax.lax.scan(
            body, (x, kpool, vpool, jnp.zeros((), jnp.int32)), params["layers"]
        )
        x = internlm2.rms_norm(x, params["norm"], cfg.rms_norm_eps, policy)
        logits = internlm2._logits(params, x, policy, cfg)[:, 0]
        return logits, kpool, vpool

    def _derive_step_arrays(self, page_table, lengths, starts):
        """(B,) lengths/starts -> (valid (B,P,page), write_page, write_off,
        positions) — the host bookkeeping, computed on device."""
        flat = jnp.arange(self.P * self.page, dtype=jnp.int32)[None, :]
        valid = (
            (flat >= starts[:, None]) & (flat < (lengths + 1)[:, None])
        ).astype(jnp.int32).reshape(-1, self.P, self.page)
        page_idx = (lengths // self.page).astype(jnp.int32)
        write_page = jnp.take_along_axis(page_table, page_idx[:, None], axis=1)[:, 0]
        write_off = (lengths % self.page).astype(jnp.int32)
        positions = (lengths - starts).astype(jnp.int32)[:, None]
        return valid, write_page, write_off, positions

    def _decode_k_impl(self, params, first_tokens, kpool, vpool, page_table,
                       lengths, starts, seen, k, pens, active):
        from callireader_tpu.runtime.serving import _pick_tokens

        def body(carry, _):
            toks, kpool, vpool, lengths, seen = carry
            valid, wp, wo, pos = self._derive_step_arrays(page_table, lengths, starts)
            logits, kpool, vpool = self._decode_impl(
                params, toks[:, None], kpool, vpool, page_table, valid, wp, wo, pos
            )
            new_toks, seen = _pick_tokens(logits, seen, pens)
            lengths = lengths + active.astype(lengths.dtype)
            return (new_toks, kpool, vpool, lengths, seen), new_toks

        (_, kpool, vpool, _, seen), toks = jax.lax.scan(
            body, (first_tokens, kpool, vpool, lengths, seen), None, length=k
        )
        return toks, kpool, vpool, seen

    def _xla_paged_attention(self, q, kpool, vpool, idx, page_table, valid):
        """Fallback paged attention (gathers pages; used off-TPU)."""
        B = q.shape[0]
        lk = jax.lax.dynamic_index_in_dim(kpool, idx, 0, keepdims=False)  # (NP,Hkv,page,D)
        lv = jax.lax.dynamic_index_in_dim(vpool, idx, 0, keepdims=False)
        k = lk[page_table]  # (B, P, Hkv, page, D)
        v = lv[page_table]
        Bp, P, Hkv, page, D = k.shape
        k = k.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, P * page, D)
        v = v.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, P * page, D)
        kv_seg = jnp.where(valid.reshape(B, P * page) > 0, 0, -9).astype(jnp.int32)
        from callireader_tpu.kernels.attention import attention_reference

        return attention_reference(
            q, k.astype(q.dtype), v.astype(q.dtype), causal=False,
            q_segment_ids=jnp.zeros((B, 1), jnp.int32), kv_segment_ids=kv_seg,
        )

    # ------------------------------------------------------------------

    @property
    def slot_req(self) -> List[Optional[Request]]:
        """ContinuousBatcher-compatible view for the HTTP scheduler loop."""
        return [s.req if s is not None else None for s in self.slots]

    def submit(self, req: Request) -> None:
        # h2d the prompt embeds now so the transfer overlaps in-flight decode
        # (see runtime/serving.ContinuousBatcher.submit)
        if req.dev_embeds is None:
            req.dev_embeds = jnp.asarray(req.embeds)
        self._prehash(req)
        self.queue.append(req)

    def _reject(self, req: Request, why: str) -> None:
        req.tokens = []
        req.error = why
        self.done.append(req)

    def _preempt(self, s: int) -> None:
        """vLLM-style preempt-and-recompute: free the slot's pages and requeue
        its request at the front, with the tokens generated so far folded into
        the prompt embeds — re-admission replays them through one prefill (a
        registered prefix makes that prefill chunked and cheap) and decode
        resumes exactly where it stopped."""
        slot = self.slots[s]
        req = slot.req
        if req.tokens:
            emb = np.asarray(
                self._embed_rows(self.params, jnp.asarray([req.tokens], jnp.int32))[0]
            ).astype(req.embeds.dtype)
            req.embeds = np.concatenate([req.embeds, emb], axis=0)
            req.dev_embeds = None  # stale; re-h2d at re-admission
        self.pool.release(slot.pages)
        self.slots[s] = None
        self._pending[s] = None
        self.queue.insert(0, req)
        self.n_preempted += 1

    def _grow(self, s: int, need: int) -> bool:
        """Grow slot ``s``'s pages until they cover ``need`` tokens. When the
        pool runs dry, preempt the youngest OTHER slot and retry; if no other
        slot exists the pool itself cannot hold this request — fail it (never
        the server). Returns False when the slot no longer exists or hit the
        architectural P-page cap (caller retires it as length-finished)."""
        slot = self.slots[s]
        while len(slot.pages) * self.page < need:
            if len(slot.pages) >= self.P:
                return False
            if not self.pool.free:
                victims = [
                    (self.slots[t].seq, t)
                    for t in range(self.B)
                    if t != s and self.slots[t] is not None
                ]
                if not victims:
                    self.pool.release(slot.pages)
                    self.slots[s] = None
                    self._pending[s] = None
                    self._reject(
                        slot.req,
                        f"page pool exhausted mid-decode with nothing to "
                        f"preempt (need {need} tokens)",
                    )
                    return False
                self._preempt(max(victims)[1])
            slot.pages.extend(self.pool.alloc(1))
        return True

    def _admit(self) -> None:
        # take as many queued requests as free slots + pages allow, grouped by
        # prompt bucket: an n-row prefill amortizes the weight reads that
        # dominate 1-row prefill. Only the PROMPT's pages are taken here —
        # decode growth allocates lazily (see _grow), so admission doesn't
        # hoard pages for generation that may never happen.
        free_slots = [s for s in range(self.B) if self.slots[s] is None]
        taken: List[Tuple[Request, int, List[int]]] = []  # (req, bucket, pages)
        cap = self.P * self.page
        while free_slots[len(taken):] and self.queue:
            req = self.queue[0]
            S = req.embeds.shape[0]
            try:
                bucket = gen.bucket_length(max(S, self.page))
            except ValueError:
                self.queue.pop(0)
                if req.tokens:
                    # resumed after preemption and the grown prompt no longer
                    # buckets: retire as length-finished with the output it
                    # already produced (the uncontended run would have kept
                    # at least these tokens) — never discard generated text
                    # on a scheduling artifact
                    self.done.append(req)
                else:
                    self._reject(req, f"prompt length {S} exceeds buckets")
                continue
            bucket = -(-bucket // self.page) * self.page
            # admission guard: the prompt (plus the windowed-mode decode
            # headroom) must fit a slot's page budget. Clamping n_pages here
            # would crash _insert_pages (bucket needs > P pages) or silently
            # overwrite prompt KV (first window past a full slot) — fail the
            # request, never the server.
            headroom = self.steps_per_sync if self.steps_per_sync > 1 else 0
            if bucket + headroom > cap:
                self.queue.pop(0)
                if req.tokens:
                    # resumed request outgrew a slot: length-finish, keep
                    # tokens (see bucket-overflow branch above)
                    self.done.append(req)
                else:
                    self._reject(
                        req,
                        f"prompt bucket {bucket} + window {headroom} exceeds "
                        f"slot capacity {cap} ({self.P} pages x {self.page})",
                    )
                continue
            n_pages = bucket // self.page
            # watermark: leave growth headroom for the decodes already running
            reserve = self.watermark if any(s is not None for s in self.slots) or taken else 0
            if len(self.pool.free) < n_pages + reserve:
                break  # backpressure: wait for pages
            self.queue.pop(0)
            taken.append((req, bucket, self.pool.alloc(n_pages)))
        if not taken:
            return

        it = iter(free_slots)
        grouped = self._group_admissions([(r, b, p) for r, b, p in taken])
        for (bucket, _dig), (entry, group) in grouped.items():
            plen = entry.plen if entry is not None else 0
            # n <= num_slots jit variants per (bucket, plen), one-time compile
            # cost. rows were h2d'd at submit(); left-pad on device
            if plen:
                stack, mask = self._prefix_prefill_rows(
                    [r for r, _ in group], bucket, plen
                )
                logits, cache = self._prefill_prefix_fn(bucket, plen)(
                    self.params, stack, mask, entry.k, entry.v,
                )
                self.prefix_hits += len(group)
            else:
                rows = []
                mask = np.zeros((len(group), bucket), np.int32)
                for i, (req, _pages) in enumerate(group):
                    S = req.embeds.shape[0]
                    e = req.dev_embeds if req.dev_embeds is not None else jnp.asarray(req.embeds)
                    rows.append(jnp.pad(e, ((bucket - S, 0), (0, 0))))
                    mask[i, bucket - S:] = 1
                logits, cache = self._prefill_fn(bucket)(
                    self.params, jnp.stack(rows), jnp.asarray(mask)
                )
            n_prompt = bucket // self.page
            for i, (req, pages) in enumerate(group):
                s = next(it)
                ids = jnp.asarray(pages[:n_prompt], jnp.int32)
                self.kpool = self._insert_pages(
                    cache.k[:, i : i + 1], self.kpool, ids
                )
                self.vpool = self._insert_pages(
                    cache.v[:, i : i + 1], self.vpool, ids
                )
                self.last_logits = self.last_logits.at[s].set(logits[i])
                self._admit_seq += 1
                self.slots[s] = _Slot(
                    req=req, pages=pages, start=bucket - req.embeds.shape[0],
                    length=bucket, seq=self._admit_seq,
                )
                self.seen = self._clear_seen(self.seen, s)
                if req.tokens:
                    # resumed after preemption: its generated ids were folded
                    # into the prompt; re-mark them for repetition-penalty
                    # parity with the uninterrupted run
                    self.seen = self.seen.at[s, jnp.asarray(req.tokens)].set(True)
                else:
                    req.tokens = []
                if self.steps_per_sync > 1:
                    # device ref: admits pipeline; resolved in _step_windowed.
                    # Penalty-aware pick (not raw argmax): a resumed request's
                    # seed token must see the freshly re-marked seen rows
                    self._pending[s] = self._pick_seed(
                        logits[i], self.seen[s],
                        jnp.asarray(req.repetition_penalty, jnp.float32),
                    )

    def step(self) -> int:
        self._admit()
        active = [s for s in range(self.B) if self.slots[s] is not None]
        if not active:
            return 0
        if self.steps_per_sync > 1:
            return self._step_windowed(active)

        pens = np.ones(self.B, np.float32)
        for s in active:
            pens[s] = self.slots[s].req.repetition_penalty
        toks_dev, self.seen = self._pick(self.last_logits, self.seen, jnp.asarray(pens))
        next_tokens = np.asarray(toks_dev)  # B ids — the only per-step d2h
        for s in active:
            slot = self.slots[s]
            req = slot.req
            tok = int(next_tokens[s])
            req.tokens.append(tok)
            if tok in req.eos_token_ids or len(req.tokens) >= req.max_new_tokens or (
                slot.length + 1 >= self.P * self.page  # architectural cap
            ):
                self.done.append(req)
                self.pool.release(slot.pages)
                self.slots[s] = None

        # lazy growth: every survivor needs capacity for the token the decode
        # below will write at offset `length`; exhaustion preempts the
        # youngest other slot (its request requeues and replays)
        for s in range(self.B):
            if self.slots[s] is not None:
                self._grow(s, self.slots[s].length + 1)

        still = [s for s in range(self.B) if self.slots[s] is not None]
        if still:
            page_table = np.zeros((self.B, self.P), np.int32)
            valid = np.zeros((self.B, self.P, self.page), np.int32)
            write_page = np.zeros(self.B, np.int32)
            write_off = np.zeros(self.B, np.int32)
            positions = np.zeros((self.B, 1), np.int32)
            for s in still:
                slot = self.slots[s]
                page_table[s, : len(slot.pages)] = slot.pages
                for i in range(len(slot.pages)):
                    lo, hi = i * self.page, (i + 1) * self.page
                    span_lo = max(lo, slot.start)
                    span_hi = min(hi, slot.length + 1)  # +1: the token being written
                    if span_hi > span_lo:
                        valid[s, i, span_lo - lo : span_hi - lo] = 1
                write_page[s] = page_table[s, slot.length // self.page]
                write_off[s] = slot.length % self.page
                positions[s, 0] = slot.length - slot.start

            logits_new, self.kpool, self.vpool = self._decode(
                self.params, jnp.asarray(next_tokens[:, None]),
                self.kpool, self.vpool,
                jnp.asarray(page_table), jnp.asarray(valid),
                jnp.asarray(write_page), jnp.asarray(write_off),
                jnp.asarray(positions),
            )
            self.last_logits = logits_new
            for s in still:
                self.slots[s].length += 1
        return len(still)

    def _step_windowed(self, active: List[int]) -> int:
        k = self.steps_per_sync
        fresh = [s for s in active if not isinstance(self._pending[s], int)]
        if fresh:
            seeds = [int(v) for v in np.asarray(jnp.stack([self._pending[s] for s in fresh]))]
            for s, tok in zip(fresh, seeds):
                slot = self.slots[s]
                req = slot.req
                req.tokens.append(tok)
                self.seen = self.seen.at[s, tok].set(True)
                if tok in req.eos_token_ids or len(req.tokens) >= req.max_new_tokens:
                    self.done.append(req)
                    self.pool.release(slot.pages)
                    self.slots[s] = None
                    self._pending[s] = None
                else:
                    self._pending[s] = tok
            active = [s for s in active if self.slots[s] is not None]
            if not active:
                return 0
        # lazy growth: the window writes at length..length+k-1 per slot
        for s in list(active):
            if self.slots[s] is not None:
                self._grow(s, self.slots[s].length + k)
        active = [s for s in active if self.slots[s] is not None]
        if not active:
            return 0
        next_tokens = np.zeros(self.B, np.int32)
        pens = np.ones(self.B, np.float32)
        page_table = np.zeros((self.B, self.P), np.int32)
        lengths = np.zeros(self.B, np.int32)
        starts = np.zeros(self.B, np.int32)
        active_mask = np.zeros(self.B, bool)
        for s in active:
            slot = self.slots[s]
            next_tokens[s] = self._pending[s]
            pens[s] = slot.req.repetition_penalty
            page_table[s, : len(slot.pages)] = slot.pages
            lengths[s] = slot.length
            starts[s] = slot.start
            active_mask[s] = True
        window, self.kpool, self.vpool, self.seen = self._decode_k(
            self.params, jnp.asarray(next_tokens), self.kpool, self.vpool,
            jnp.asarray(page_table), jnp.asarray(lengths), jnp.asarray(starts),
            self.seen, k, jnp.asarray(pens), jnp.asarray(active_mask),
        )
        window = np.asarray(window)  # (k, B) — ONE d2h per k steps
        for s in active:
            slot = self.slots[s]
            req = slot.req
            cap = self.P * self.page  # architectural cap; _grow covers the rest
            retired = False
            for j in range(k):
                tok = int(window[j, s])
                slot.length += 1
                if retired:
                    continue
                req.tokens.append(tok)
                if (
                    tok in req.eos_token_ids
                    or len(req.tokens) >= req.max_new_tokens
                    or slot.length + k >= cap
                ):
                    self.done.append(req)
                    self.pool.release(slot.pages)
                    self.slots[s] = None
                    self._pending[s] = None
                    retired = True
            if not retired:
                self._pending[s] = int(window[k - 1, s])
        return len([s for s in range(self.B) if self.slots[s] is not None])

    def run(self) -> List[Request]:
        while self.queue or any(s is not None for s in self.slots):
            self.step()
        out, self.done = self.done, []
        return out
