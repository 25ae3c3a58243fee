"""Continuous-batching serving scheduler.

No reference equivalent — the reference decodes one request at a time through
HF generate (evaluate.py:142-143 runs CalliBench strictly sequentially). This
scheduler keeps a fixed pool of KV-cache slots busy: requests prefill into free
slots as they arrive and every active slot advances one token per device step,
so short answers retire early and their slots are refilled without waiting for
the longest request in a batch (the static-batching failure mode).

Device programs (jitted once per shape):
  - multi-row prefill (internlm2.prefill at the prompt bucket; same-bucket
    admissions share one call, amortizing weight reads)
  - multi-slot decode (internlm2.decode_step_multislot over the slot pool),
    optionally k steps per host tick (steps_per_sync)
  - on-device token pick (repetition penalty + argmax + seen-mask)
Host keeps the queue/slot bookkeeping — O(slots) python per tick, with B (or
k*B) token ids as the only device->host traffic.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import LLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import generate as gen


def _penalize(logits, seen, pens):
    """HF repetition penalty over the already-seen vocab rows, per slot."""
    pen = jnp.where(logits < 0, logits * pens[:, None], logits / pens[:, None])
    return jnp.where(seen, pen, logits)


def _pick_tokens(logits, seen, pens):
    """HF repetition-penalty + greedy argmax for every slot, on device."""
    toks = jnp.argmax(_penalize(logits, seen, pens), axis=-1).astype(jnp.int32)
    seen = seen.at[jnp.arange(seen.shape[0]), toks].set(True)
    return toks, seen


@dataclasses.dataclass
class Request:
    uid: int
    embeds: np.ndarray  # (S, E) prompt embeddings (post-splice)
    max_new_tokens: int = 1024
    eos_token_ids: Tuple[int, ...] = (92542,)
    repetition_penalty: float = 1.0
    # filled on completion:
    tokens: Optional[List[int]] = None
    # set instead of tokens when the request is rejected at admission (prompt
    # exceeds the cache capacity) — the request fails, never the server
    error: Optional[str] = None
    # device-resident copy of `embeds`, populated at submit() so the h2d
    # transfer overlaps the in-flight decode instead of stalling admission
    dev_embeds: Optional[Any] = None
    # memoized prefix digests: plen -> sha1 of embeds[:plen]. Populated at
    # submit() (handler thread) so the scheduler thread's admission matching
    # never hashes multi-MB prompt rows (it stalls decode ticks otherwise)
    digests: Dict[int, bytes] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class PrefixEntry:
    """One cached prompt prefix: its embed-row digest + device KV."""

    digest: bytes
    plen: int
    k: Any  # (L, Hkv, plen, D)
    v: Any
    last_used: int = 0  # monotone tick for LRU eviction


def _digest_rows(embeds: np.ndarray) -> bytes:
    return hashlib.sha1(
        np.ascontiguousarray(embeds, np.float32).tobytes()
    ).digest()


class PrefixCacheMixin:
    """Prefix KV cache shared by the contiguous and paged batchers: register a
    prompt prefix once (system prompt, chat history, agent transcript); later
    requests whose leading embed rows match bit-exactly prefill only their
    suffix via internlm2.prefill_with_prefix. Host classes must provide
    ``params/cfg/policy/use_flash/mesh``, ``_prefill_fn(bucket)``, a
    ``_cache_dtype`` property, and ``_prefix_prefill_max_len(bucket)`` (the
    cache capacity the chunked-prefill program must emit)."""

    def _init_prefix_cache(self) -> None:
        self._prefill_prefix_cache: Dict[Tuple[int, int], Callable] = {}
        self.prefixes: List[PrefixEntry] = []
        self.prefix_hits = 0
        # registered-prefix KV is device memory ((L, Hkv, plen, D) each);
        # cap the registry and evict the least-recently-hit entry past it
        self.max_prefixes = 8

    def register_prefix(self, embeds: np.ndarray, *, quantum: int = 128) -> int:
        """Prefill ``embeds`` once and cache its KV. Subsequent requests whose
        prompt starts with these embed rows (bit-exact) prefill only the
        remainder. The cached length is floored to a ``quantum`` multiple so
        the chunked-prefill jit shapes stay bucketed, and clamped below the
        batcher's cache capacity (a hit must leave suffix room). If a shorter
        registered prefix already covers the leading rows, only the delta is
        prefilled (chunked, over the cached KV) — multi-turn auto-registration
        then costs one small suffix prefill per turn instead of re-prefilling
        the whole transcript. Returns the cached length in tokens (0 = not
        cacheable)."""
        cap = self._prefix_capacity()
        plen = (min(embeds.shape[0], cap - quantum) // quantum) * quantum
        if plen <= 0:
            return 0
        rows = embeds[:plen]
        digest = _digest_rows(rows)
        base: Optional[PrefixEntry] = None
        for e in self.prefixes:  # kept sorted by -plen: first hit is longest
            if e.plen == plen and e.digest == digest:
                e.last_used = self.prefix_hits
                return plen
            if (
                base is None
                and e.plen < plen
                and _digest_rows(rows[: e.plen]) == e.digest
            ):
                base = e
        if base is not None:
            k, v = self._extend_prefix_kv(base, rows[base.plen:])
        else:
            logits, cache = self._prefill_fn(plen)(
                self.params, jnp.asarray(rows)[None],
                jnp.ones((1, plen), jnp.int32),
            )
            del logits
            k, v = cache.k[:, 0, :, :plen], cache.v[:, 0, :, :plen]
        self.prefixes.append(PrefixEntry(
            digest=digest, plen=plen, k=k, v=v, last_used=self.prefix_hits,
        ))
        if len(self.prefixes) > self.max_prefixes:
            self.prefixes.remove(min(self.prefixes, key=lambda e: e.last_used))
        self.prefixes.sort(key=lambda e: -e.plen)
        return plen

    def _extend_prefix_kv(self, base: PrefixEntry, suffix_rows: np.ndarray):
        """KV for ``[base | suffix_rows]`` via one chunked prefill over the
        base entry's cached KV — the registration analogue of a prefix-hit
        admission. suffix_rows is unpadded, so the returned layout is exactly
        ``[prefix | suffix]`` at rows [0, total)."""
        sb = int(suffix_rows.shape[0])
        total = base.plen + sb
        key = ("ext", base.plen, sb)
        if key not in self._prefill_prefix_cache:
            self._prefill_prefix_cache[key] = jax.jit(
                lambda p, e, m, pk, pv: internlm2.prefill_with_prefix(
                    p, self.cfg, inputs_embeds=e, attention_mask=m,
                    prefix_k=pk, prefix_v=pv, max_len=total,
                    policy=self.policy, use_flash=self.use_flash,
                    cache_dtype=self._cache_dtype, mesh=self.mesh,
                )
            )
        logits, cache = self._prefill_prefix_cache[key](
            self.params, jnp.asarray(suffix_rows)[None],
            jnp.ones((1, sb), jnp.int32), base.k, base.v,
        )
        del logits
        return cache.k[:, 0, :, :total], cache.v[:, 0, :, :total]

    def _req_digest(self, req: Request, plen: int) -> bytes:
        d = req.digests.get(plen)
        if d is None:
            d = _digest_rows(req.embeds[:plen])
            req.digests[plen] = d
        return d

    def _prehash(self, req: Request) -> None:
        """Memoize the request's digests at the currently registered plens —
        called from submit() (handler thread) so admission matching on the
        scheduler thread is dictionary lookups, not multi-MB sha1 passes.
        Iterates a snapshot: register_prefix on the scheduler thread mutates
        self.prefixes concurrently (a missed entry only costs a memoization)."""
        for e in list(self.prefixes):
            if req.embeds.shape[0] > e.plen:
                self._req_digest(req, e.plen)

    def _match_prefix(self, req: Request) -> Optional[PrefixEntry]:
        # longest registered prefix that leaves >= 1 suffix token (the chunked
        # prefill computes next-token logits from the suffix's last row)
        for e in self.prefixes:
            if req.embeds.shape[0] > e.plen and self._req_digest(req, e.plen) == e.digest:
                e.last_used = self.prefix_hits
                return e
        return None

    def _prefill_prefix_fn(self, bucket: int, plen: int):
        key = (bucket, plen)
        if key not in self._prefill_prefix_cache:
            max_len = self._prefix_prefill_max_len(bucket)
            self._prefill_prefix_cache[key] = jax.jit(
                lambda p, e, m, pk, pv: internlm2.prefill_with_prefix(
                    p, self.cfg, inputs_embeds=e, attention_mask=m,
                    prefix_k=pk, prefix_v=pv, max_len=max_len,
                    policy=self.policy, use_flash=self.use_flash,
                    cache_dtype=self._cache_dtype, mesh=self.mesh,
                )
            )
        return self._prefill_prefix_cache[key]

    def _group_admissions(self, reqs_with_buckets):
        """(req, bucket, payload) triples -> {(bucket, digest): (entry, [(req, payload)])}.

        Keyed by the matched entry's DIGEST, not its plen: two different
        registered prefixes can share a (quantized) length, and collapsing
        their hits into one group would prefill every request in it against
        the first entry's KV — wrong generations + cross-conversation KV
        leakage. Callers read plen off the group's entry."""
        by_key: Dict[Tuple[int, bytes], Tuple[Optional[PrefixEntry], List[Any]]] = {}
        for req, bucket, payload in reqs_with_buckets:
            entry = self._match_prefix(req) if self.prefixes else None
            key = (bucket, entry.digest if entry is not None else b"")
            by_key.setdefault(key, (entry, []))[1].append((req, payload))
        return by_key

    def _prefix_prefill_rows(self, reqs, bucket: int, plen: int):
        """Left-padded suffix rows + mask for a prefix-hit admission group."""
        sb = bucket - plen
        rows = []
        mask = np.zeros((len(reqs), sb), np.int32)
        for i, req in enumerate(reqs):
            slen = req.embeds.shape[0] - plen
            e = req.dev_embeds if req.dev_embeds is not None else jnp.asarray(req.embeds)
            rows.append(jnp.pad(e[plen:], ((sb - slen, 0), (0, 0))))
            mask[i, sb - slen:] = 1
        return jnp.stack(rows), jnp.asarray(mask)


class ContinuousBatcher(PrefixCacheMixin):
    def __init__(
        self,
        llm_params: Dict[str, Any],
        cfg: LLMConfig,
        *,
        num_slots: int = 8,
        max_len: int = 4096,
        policy: DTypePolicy = DEFAULT_POLICY,
        use_flash: Optional[bool] = None,
        cache_dtype=jnp.bfloat16,
        steps_per_sync: int = 1,
        mesh=None,
    ):
        self.params = llm_params
        self.cfg = cfg
        self.B = num_slots
        self.max_len = max_len
        # >1: run K decode steps per host tick in one on-device scan — the
        # host sees K*B token ids per round trip instead of B, amortizing the
        # dispatch/transfer latency K-fold. Costs up to K-1 throwaway steps
        # per retiring request and delays admission by up to K steps.
        self.steps_per_sync = max(1, steps_per_sync)
        self.policy = policy
        self.use_flash = use_flash
        self.mesh = mesh
        shape = (
            cfg.num_hidden_layers, num_slots, cfg.num_key_value_heads,
            max_len, cfg.head_dim,
        )
        if mesh is not None:
            # sharded serving: the KV cache shards over the tensor axis on
            # kv-heads (matching the wk/wv projections) so slot memory scales
            # down with the mesh — required to serve callireader-8b, whose
            # cache would not fit one chip alongside its weights
            from jax.sharding import NamedSharding, PartitionSpec as P

            from callireader_tpu.core import partition as part

            spec = part.spec_for_shape(
                shape, (None, None, "kv_heads", None, None), mesh=mesh
            )
            kv_sh = NamedSharding(mesh, spec)
            self.cache_k = jax.device_put(jnp.zeros(shape, cache_dtype), kv_sh)
            self.cache_v = jax.device_put(jnp.zeros(shape, cache_dtype), kv_sh)
        else:
            self.cache_k = jnp.zeros(shape, cache_dtype)
            self.cache_v = jnp.zeros(shape, cache_dtype)
        self.lengths = np.zeros(num_slots, np.int64)
        self.starts = np.zeros(num_slots, np.int64)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        # seen-token mask lives on device: the per-step host transfer is then
        # B token ids instead of (B, vocab) logits (~3MB/step over a remote
        # link — it dominated the step loop)
        self.seen = jnp.zeros((num_slots, cfg.vocab_size), jnp.bool_)
        self.last_logits = jnp.zeros((num_slots, cfg.vocab_size), jnp.float32)
        self.queue: List[Request] = []
        self.done: List[Request] = []
        self._pending: List[Optional[int]] = [None] * num_slots

        self._decode = jax.jit(
            lambda p, ids, ck, cv, lengths, active, starts: internlm2.decode_step_multislot(
                p, cfg, input_ids=ids, cache_k=ck, cache_v=cv,
                lengths=lengths, active=active, starts=starts, policy=policy,
                use_flash=use_flash, mesh=mesh,
            )
        )
        self._insert = jax.jit(self._insert_impl, donate_argnums=(1, 2))
        self._pick = jax.jit(_pick_tokens, donate_argnums=(1,))
        self._decode_k = jax.jit(self._decode_k_impl, donate_argnums=(2, 3, 7),
                                 static_argnums=(8,))
        self._clear_seen = jax.jit(
            lambda seen, slot: seen.at[slot].set(False), donate_argnums=(0,)
        )
        self._prefill_cache: Dict[int, Callable] = {}
        self._init_prefix_cache()

    @property
    def _cache_dtype(self):
        return self.cache_k.dtype

    def _prefix_prefill_max_len(self, bucket: int) -> int:
        del bucket  # _insert slices the bucket region out of a max_len cache
        return self.max_len

    def _prefix_capacity(self) -> int:
        return self.max_len

    # ------------------------------------------------------------------

    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefill_cache:
            self._prefill_cache[bucket] = jax.jit(
                lambda p, e, m: internlm2.prefill(
                    p, self.cfg, inputs_embeds=e, attention_mask=m,
                    max_len=self.max_len, policy=self.policy,
                    use_flash=self.use_flash, cache_dtype=self.cache_k.dtype,
                    mesh=self.mesh,
                )
            )
        return self._prefill_cache[bucket]

    def _decode_k_impl(self, params, first_tokens, ck, cv, lengths, active,
                       starts, seen, k, pens):
        """K fused decode+pick steps; returns the K-1 follow-on tokens after
        ``first_tokens`` plus the final-step picks (K*B ids total per sync)."""
        def body(carry, _):
            toks, ck, cv, lengths, seen = carry
            logits, ck, cv = internlm2.decode_step_multislot(
                params, self.cfg, input_ids=toks[:, None], cache_k=ck,
                cache_v=cv, lengths=lengths, active=active, starts=starts,
                policy=self.policy, use_flash=self.use_flash, mesh=self.mesh,
            )
            new_toks, seen = _pick_tokens(logits, seen, pens)
            lengths = lengths + active.astype(lengths.dtype)
            return (new_toks, ck, cv, lengths, seen), new_toks

        (_, ck, cv, lengths, seen), toks = jax.lax.scan(
            body, (first_tokens, ck, cv, lengths, seen), None, length=k
        )
        return toks, ck, cv, seen

    def _insert_impl(self, src_kv, cache_k, cache_v, slot):
        # src holds only the prompt-bucket prefix — copying the full max_len
        # region would move the whole slot's cache per admitted request
        sk, sv = src_kv  # (L, 1, Hkv, bucket, D)
        cache_k = jax.lax.dynamic_update_slice(cache_k, sk, (0, slot, 0, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, sv, (0, slot, 0, 0, 0))
        return cache_k, cache_v

    def submit(self, req: Request) -> None:
        # start the prompt-embed h2d now: it rides the DMA engines under the
        # decode steps already in flight, so admission later finds the rows
        # device-resident (prefill pipelining, the batch_prepare trick)
        if req.dev_embeds is None:
            req.dev_embeds = jnp.asarray(req.embeds)
        self._prehash(req)
        self.queue.append(req)

    def _reject(self, req: Request, why: str) -> None:
        req.tokens = []
        req.error = why
        self.done.append(req)

    def _admission_bucket(self, req: Request) -> Optional[int]:
        """Prompt bucket if the request fits the cache, else None (rejected).
        Windowed mode needs `steps_per_sync` write headroom past the bucket —
        otherwise the first window's out-of-range cache writes would corrupt
        or drop KV before the late cap check retires the slot."""
        try:
            bucket = gen.bucket_length(req.embeds.shape[0])
        except ValueError:
            self._reject(req, f"prompt length {req.embeds.shape[0]} exceeds buckets")
            return None
        headroom = self.steps_per_sync if self.steps_per_sync > 1 else 0
        if bucket + headroom > self.max_len:
            self._reject(
                req,
                f"prompt bucket {bucket} + window {headroom} exceeds max_len {self.max_len}",
            )
            return None
        return bucket

    def _fill_free_slots(self) -> None:
        free = [s for s in range(self.B) if self.slot_req[s] is None]
        if not free or not self.queue:
            return
        # group the admissible requests by (prompt bucket, matched prefix): a
        # single n-row prefill amortizes the weight reads that dominate 1-row
        # prefill; prefix-cache hits share one chunked-prefill program
        take = self.queue[: len(free)]
        del self.queue[: len(take)]
        admissible = []
        for req in take:
            bucket = self._admission_bucket(req)
            if bucket is not None:
                admissible.append((req, bucket, req))
        it = iter(free)
        for (bucket, _dig), (entry, pairs) in self._group_admissions(admissible).items():
            plen = entry.plen if entry is not None else 0
            reqs = [r for r, _ in pairs]
            # jit caches one program per (bucket, plen, n) shape; n <= num_slots
            # and the persistent compilation cache makes each a one-time cost.
            # rows were h2d'd at submit(); left-pad on device (no host copy)
            if plen:
                stack, mask = self._prefix_prefill_rows(reqs, bucket, plen)
                logits, cache = self._prefill_prefix_fn(bucket, plen)(
                    self.params, stack, mask, entry.k, entry.v,
                )
                self.prefix_hits += len(reqs)
            else:
                rows = []
                mask = np.zeros((len(reqs), bucket), np.int32)
                for i, req in enumerate(reqs):
                    S = req.embeds.shape[0]
                    e = req.dev_embeds if req.dev_embeds is not None else jnp.asarray(req.embeds)
                    rows.append(jnp.pad(e, ((bucket - S, 0), (0, 0))))
                    mask[i, bucket - S:] = 1
                logits, cache = self._prefill_fn(bucket)(
                    self.params, jnp.stack(rows), jnp.asarray(mask)
                )
            for i, req in enumerate(reqs):
                slot = next(it)
                self.cache_k, self.cache_v = self._insert(
                    (cache.k[:, i : i + 1, :, :bucket, :],
                     cache.v[:, i : i + 1, :, :bucket, :]),
                    self.cache_k, self.cache_v, jnp.asarray(slot, jnp.int32),
                )
                self.last_logits = self.last_logits.at[slot].set(logits[i])
                self.lengths[slot] = bucket  # left-padded rows occupy [0, bucket)
                self.starts[slot] = bucket - req.embeds.shape[0]
                self.slot_req[slot] = req
                self.seen = self._clear_seen(self.seen, slot)
                req.tokens = []
                if self.steps_per_sync > 1:
                    # windowed mode keeps per-slot pending input tokens; the
                    # argmax stays a device ref so admits pipeline their
                    # prefills (resolved in one sync at the next window)
                    self._pending[slot] = jnp.argmax(logits[i])

    def step(self) -> int:
        """One scheduler tick: fill slots, sample every active slot's next
        token, run one fused decode. Returns number of active slots."""
        self._fill_free_slots()
        active = [s for s in range(self.B) if self.slot_req[s] is not None]
        if not active:
            return 0

        if self.steps_per_sync > 1:
            return self._step_windowed(active)

        pens = np.ones(self.B, np.float32)
        for s in active:
            pens[s] = self.slot_req[s].repetition_penalty
        toks_dev, self.seen = self._pick(self.last_logits, self.seen, jnp.asarray(pens))
        next_tokens = np.asarray(toks_dev)  # B ids — the only per-step d2h
        for s in active:
            req = self.slot_req[s]
            tok = int(next_tokens[s])
            req.tokens.append(tok)
            if tok in req.eos_token_ids or len(req.tokens) >= req.max_new_tokens or (
                self.lengths[s] + 1 >= self.max_len
            ):
                self.done.append(req)
                self.slot_req[s] = None

        still = [s for s in range(self.B) if self.slot_req[s] is not None]
        if not still:
            return 0
        active_mask = np.zeros(self.B, bool)
        active_mask[still] = True
        logits_new, self.cache_k, self.cache_v = self._decode(
            self.params, jnp.asarray(next_tokens[:, None]),
            self.cache_k, self.cache_v,
            jnp.asarray(self.lengths.astype(np.int32)),
            jnp.asarray(active_mask),
            jnp.asarray(self.starts.astype(np.int32)),
        )
        self.last_logits = logits_new
        for s in still:
            self.lengths[s] += 1
        return len(still)

    def _step_windowed(self, active: List[int]) -> int:
        """steps_per_sync decode+pick steps in one device scan. Each slot's
        pending token feeds the window; every picked token is a real generated
        token (appended exactly once, fed as the next input exactly once).
        One (k, B)-id d2h per k steps instead of k round trips."""
        k = self.steps_per_sync
        # resolve freshly admitted slots' seed tokens (one sync for all)
        fresh = [s for s in active if not isinstance(self._pending[s], int)]
        if fresh:
            seeds = [int(v) for v in np.asarray(jnp.stack([self._pending[s] for s in fresh]))]
            for s, tok in zip(fresh, seeds):
                req = self.slot_req[s]
                req.tokens.append(tok)
                self.seen = self.seen.at[s, tok].set(True)
                if tok in req.eos_token_ids or req.max_new_tokens <= 1:
                    self.done.append(req)
                    self.slot_req[s] = None
                    self._pending[s] = None
                else:
                    self._pending[s] = tok
            active = [s for s in active if self.slot_req[s] is not None]
            if not active:
                return 0
        next_tokens = np.zeros(self.B, np.int32)
        pens = np.ones(self.B, np.float32)
        for s in active:
            next_tokens[s] = self._pending[s]
            pens[s] = self.slot_req[s].repetition_penalty
        active_mask = np.zeros(self.B, bool)
        active_mask[active] = True
        window, self.cache_k, self.cache_v, self.seen = self._decode_k(
            self.params, jnp.asarray(next_tokens),
            self.cache_k, self.cache_v,
            jnp.asarray(self.lengths.astype(np.int32)),
            jnp.asarray(active_mask),
            jnp.asarray(self.starts.astype(np.int32)),
            self.seen, k, jnp.asarray(pens),
        )
        window = np.asarray(window)  # (k, B)
        for s in active:
            req = self.slot_req[s]
            retired = False
            for j in range(k):
                tok = int(window[j, s])
                self.lengths[s] += 1
                if retired:
                    continue
                req.tokens.append(tok)
                if (
                    tok in req.eos_token_ids
                    or len(req.tokens) >= req.max_new_tokens
                    or self.lengths[s] + k >= self.max_len
                ):
                    self.done.append(req)
                    self.slot_req[s] = None
                    self._pending[s] = None
                    retired = True
            if not retired:
                self._pending[s] = int(window[k - 1, s])
        return len([s for s in range(self.B) if self.slot_req[s] is not None])

    def run(self) -> List[Request]:
        """Drain queue + slots to completion; returns finished requests."""
        while self.queue or any(r is not None for r in self.slot_req):
            self.step()
        out, self.done = self.done, []
        return out
