"""Dynamic-batching serving engine over the compiled CFG samplers.

The reference serves generations by running ``infer.py`` /
``myinfer.py`` as batch scripts over a dataset (infer.py:65-110) — there
is no online path. This module adds the production-serving layer a
deployment needs, built around the constraint that defines TPU serving:
**one compiled program per shape**. Arbitrary request batches would
recompile (20-40 s cold through the tunnel); instead the engine

  * quantizes every request onto a fixed grid of (out_length bucket,
    batch tier) programs — the same fixed-shape philosophy as the
    training BucketBatcher (data/loaders.py);
  * groups concurrent requests by bucket, pads the group up to the
    smallest admitted tier, dispatches ONE program, and slices the
    results back out per request;
  * keeps results independent of batch composition: noise is drawn from
    per-sample PRNG keys (vmapped typed keys) and ``cfg_scale`` is a
    per-sample RUNTIME vector, so request i's series depends only on
    (seed_i, cfg_i, text_emb_i, out_length_i) — never on which other
    requests shared its batch. That property is what makes dynamic
    batching semantically invisible;
  * runs a two-stage pipeline — ONE dispatcher thread owns device
    dispatch (deadline-based flush: a batch launches when it fills the
    largest tier or its oldest request has waited ``max_wait_ms``) and a
    completer thread host-syncs results, so the host transfer of batch N
    overlaps the device compute of batch N+1.

``make_serving_sampler`` is the shape-static analogue of
``sampling.make_cfg_sampler``: it drops the reference's ground-truth
conditioning input (infer.py:73-75 uses x_1 only for the latent shape
and a diagnostic re-encode) so serving never touches the VAE encoder,
and it routes through the same fused-stack Pallas forwards.
"""

from __future__ import annotations

import collections
import queue as _queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.models.backbones import ddpm as ddpm_lib
from t2ms_tpu.sampling.sampler import (_ddim_scan_body, _flow_body,
                                       _fused_cfg_forward, _serving_forward,
                                       _validate_solver)

__all__ = ["make_serving_sampler", "ServingEngine", "GenerationResult",
           "EngineOverloaded"]


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the pending-request cap is reached —
    admission control so a client flood degrades into fast rejections
    (HTTP 503 in cli.serve) instead of unbounded host memory growth."""


def make_serving_sampler(
    denoiser,
    vae_model,
    backbone: str = "flowmatching",
    total_step: int = 100,
    latent_shape: Tuple[int, int] = (64, 30),
    out_length: int = 96,
    solver: str = "euler",
    sample_steps: Optional[int] = None,
) -> Callable:
    """Build the jitted online-serving sampler.

    Returned signature::

        sample(params, vae_params, seeds, cfg_scale, text_emb) -> series

    with ``seeds`` (B,) uint32 per-sample noise seeds, ``cfg_scale`` (B,)
    float32 per-sample guidance weights (a RUNTIME input — one program
    serves every scale, unlike the offline sampler where it is a compile
    constant), ``text_emb`` (B, E). Differences from
    ``sampling.make_cfg_sampler`` (same step math, solver set and fused
    forwards):

      * no ``x_1``: the latent shape is static configuration, and the
        encoded-GT diagnostic (infer.py:73-75) has no online meaning;
      * per-sample typed PRNG keys for the initial noise and the DDPM
        ancestral noise, so each row's output is invariant to batch
        composition (the dynamic-batching correctness property).
    """
    _validate_solver(backbone, solver, sample_steps)
    sched = (ddpm_lib.make_schedule(total_step)
             if backbone == "ddpm" else None)
    forward = _serving_forward(denoiser)
    C, H = latent_shape

    @jax.jit
    def sample(params, vae_params, seeds, cfg_scale, text_emb):
        B = seeds.shape[0]
        keys = jax.vmap(jax.random.key)(seeds)
        x_t0 = jax.vmap(
            lambda k: jax.random.normal(k, (C, H), jnp.float32))(keys)
        # per-sample (B,1,1) guidance vector broadcasts through the same
        # uncond + scale*(cond-uncond) combine as the offline scalar
        scale = cfg_scale.astype(x_t0.dtype)[:, None, None]

        def cfg_fwd(x_t, t):
            return _fused_cfg_forward(denoiser, params, x_t, t, text_emb,
                                      scale, forward)

        def vel(x_t, t_scalar):
            return cfg_fwd(x_t, jnp.full((B,), t_scalar, x_t0.dtype))

        def ddpm_step(x_t, j):
            # ancestral noise from PER-SAMPLE keys (unlike the offline
            # sampler's shared key): batch-composition independence
            t = jnp.full((B,), total_step - 1 - j, dtype=jnp.int32)
            pred = cfg_fwd(x_t, t)
            step_keys = jax.vmap(lambda k: jax.random.fold_in(k, j))(keys)
            eps = jax.vmap(
                lambda k: jax.random.normal(k, (C, H), x_t.dtype))(step_keys)
            mean, var = ddpm_lib.p_sample_mean_var(sched, x_t, pred, t)
            return mean + jnp.sqrt(var) * eps, None

        if backbone == "ddpm" and solver == "ddim":
            ts, prev = ddpm_lib.ddim_timesteps(
                total_step, sample_steps or total_step)
            body = _ddim_scan_body(sched, cfg_fwd, B, collect=False)
            xs = (jnp.asarray(ts), jnp.asarray(prev))
        elif backbone == "ddpm":
            body, xs = ddpm_step, jnp.arange(total_step)
        else:
            body = _flow_body(solver, vel, 1.0 / total_step, total_step,
                              collect=False)
            xs = jnp.arange(total_step)
        x_t, _ = jax.lax.scan(body, x_t0, xs)
        series, _ = vae_model.apply(vae_params, x_t, out_length,
                                    method=vae_model.decode)
        return series

    return sample


@dataclass
class GenerationResult:
    """One fulfilled request."""
    series: np.ndarray
    seed: int
    out_length: int
    cfg_scale: float
    latency_s: float          # submit -> result ready
    batch_size: int           # tier the request was served at
    batched_with: int         # real (non-padding) rows in that batch


@dataclass
class _Pending:
    emb: np.ndarray
    seed: int
    cfg: float
    submit_t: float
    future: Future = field(default_factory=Future)


class ServingEngine:
    """Online generation service with per-bucket dynamic batching.

    Parameters
    ----------
    denoiser, vae_model, params, vae_params
        The trained serving bundle (same objects the infer CLIs load).
    out_lengths
        Admitted output-length buckets. Each bucket's latent shape is
        derived with ``jax.eval_shape`` over the frozen encoder — no
        compute, no compile.
    batch_tiers
        Ascending fixed batch sizes; a request group is padded up to the
        smallest tier that fits (one compiled program per bucket x tier,
        shared across requests forever — and across processes via the
        persistent compilation cache).
    max_wait_ms
        Deadline-based flush: a non-full batch launches once its oldest
        request has waited this long. 0 serves every request immediately
        (latency-optimal, throughput-poor).
    scaling_plan
        Optional ``training.scaling.ScalingPlan``: params are replicated
        over its mesh and every tier divisible by the DP width is
        dispatched data-sharded (XLA partitions the whole sampler along
        the batch axis — all ops are per-sample). Tiers below the DP
        width still run (replicated inputs, single-device work).
    probe_shape
        Encoder input shape sans batch for ONE series (the trailing time
        dim is substituted per bucket); defaults to univariate ``(T,)``
        (reference T2S, dataloader.py:21-46). Pass ``(C, T)`` for
        multivariate/motion tracks.
    max_pending
        Admission-control cap on queued (not yet dispatched) requests;
        ``submit`` raises EngineOverloaded beyond it (None = unbounded).
    """

    def __init__(self, denoiser, vae_model, params, vae_params, *,
                 backbone: str = "flowmatching", total_step: int = 100,
                 solver: str = "euler", sample_steps: Optional[int] = None,
                 out_lengths: Sequence[int] = (96,),
                 batch_tiers: Sequence[int] = (1, 4, 16),
                 max_wait_ms: float = 20.0,
                 probe_shape: Optional[Tuple[int, ...]] = None,
                 default_cfg_scale: float = 7.0,
                 text_emb_dim: int = 128,
                 scaling_plan=None,
                 max_pending: Optional[int] = None):
        if not out_lengths:
            raise ValueError("need at least one out_length bucket")
        tiers = sorted(set(int(b) for b in batch_tiers))
        if not tiers or tiers[0] < 1:
            raise ValueError(f"bad batch_tiers {batch_tiers}")
        self._tiers = tiers
        self._max_wait = max_wait_ms / 1e3
        self._default_cfg = float(default_cfg_scale)
        self._emb_dim = int(text_emb_dim)
        self._max_pending = max_pending
        self._plan = scaling_plan
        if scaling_plan is not None and scaling_plan.n_data > 1:
            from t2ms_tpu.training.scaling import replicate_tree
            params = replicate_tree(scaling_plan, params)
            vae_params = replicate_tree(scaling_plan, vae_params)
        self._params, self._vae_params = params, vae_params
        self._samplers: Dict[Tuple[int, int], Callable] = {}
        self._latent: Dict[int, Tuple[int, int]] = {}
        for L in out_lengths:
            # the probe's trailing (time) dim is replaced per bucket
            probe = ((int(L),) if probe_shape is None
                     else tuple(probe_shape[:-1]) + (int(L),))
            z = jax.eval_shape(
                lambda x: vae_model.apply(vae_params, x,
                                          method=vae_model.encode)[0],
                jax.ShapeDtypeStruct((1,) + probe, jnp.float32))
            self._latent[int(L)] = (int(z.shape[1]), int(z.shape[2]))
            for tier in tiers:
                self._samplers[(int(L), tier)] = make_serving_sampler(
                    denoiser, vae_model, backbone, total_step,
                    self._latent[int(L)], int(L), solver, sample_steps)

        # serializes device dispatch between the dispatcher thread and
        # warmup() callers (execution would serialize on-device anyway,
        # but interleaved staging muddles per-batch latency accounting)
        self._dispatch_lock = threading.Lock()
        self._lock = threading.Condition()
        self._queues: Dict[int, collections.deque] = {
            int(L): collections.deque() for L in out_lengths}
        self._stop = False
        self._seed_counter = 0
        self._stats = dict(requests=0, batches=0, padded_rows=0,
                           served_rows=0, latencies=[])
        # per-bucket accounting for mixed-length loads (VERDICT r4 #6):
        # same fields keyed by out_length, filled by the completer
        self._bucket_stats = {
            int(L): dict(batches=0, padded_rows=0, served_rows=0,
                         latencies=[]) for L in out_lengths}
        # two-stage pipeline: the dispatcher forms + dispatches batches
        # (JAX dispatch is async), the completer host-syncs and fulfils
        # futures — so the host transfer of batch N overlaps the device
        # compute of batch N+1. maxsize bounds device-queued batches.
        self._inflight = _queue.Queue(maxsize=2)
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="t2ms-serving-dispatch")
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True,
                                           name="t2ms-serving-complete")
        self._worker.start()
        self._completer.start()

    # ------------------------------------------------------------- API

    def submit(self, text_emb: np.ndarray, out_length: int,
               cfg_scale: Optional[float] = None,
               seed: Optional[int] = None) -> Future:
        """Queue one generation; returns a Future of GenerationResult."""
        out_length = int(out_length)
        if out_length not in self._queues:
            raise ValueError(f"out_length {out_length} is not an admitted "
                             f"bucket {sorted(self._queues)}")
        emb = np.asarray(text_emb, dtype=np.float32)
        if emb.shape != (self._emb_dim,):
            raise ValueError(f"text_emb must be ({self._emb_dim},) per "
                             f"request, got {emb.shape}")
        with self._lock:
            if self._stop:
                raise RuntimeError("engine is shut down")
            if self._max_pending is not None and \
                    sum(len(q) for q in self._queues.values()) \
                    >= self._max_pending:
                raise EngineOverloaded(
                    f"{self._max_pending} requests already pending")
            if seed is None:
                seed = self._seed_counter
                self._seed_counter += 1
            req = _Pending(emb, int(seed) & 0xFFFFFFFF,
                           float(self._default_cfg if cfg_scale is None
                                 else cfg_scale), time.monotonic())
            self._queues[out_length].append(req)
            self._stats["requests"] += 1
            self._lock.notify_all()
        return req.future

    def generate(self, requests) -> list:
        """Submit many [(text_emb, out_length[, cfg[, seed]]), ...] and
        block for all results (order preserved)."""
        futs = [self.submit(*r) for r in requests]
        return [f.result() for f in futs]

    def warmup(self) -> None:
        """Compile every (bucket, tier) program now (at most
        len(out_lengths) x len(batch_tiers) compiles, cached on disk by
        the persistent compilation cache)."""
        for (L, tier) in self._samplers:
            e = np.zeros((tier, self._emb_dim), np.float32)
            self._dispatch_arrays(L, tier, np.zeros((tier,), np.uint32),
                                  np.full((tier,), self._default_cfg,
                                          np.float32), e)

    @staticmethod
    def _summarize(s: dict) -> dict:
        lat = sorted(s["latencies"])
        served = s["served_rows"]
        return dict(
            batches=s["batches"],
            served_rows=served,
            padding_fraction=(s["padded_rows"] /
                              max(1, served + s["padded_rows"])),
            p50_latency_s=lat[len(lat) // 2] if lat else None,
            p95_latency_s=lat[int(len(lat) * 0.95)] if lat else None,
        )

    def stats(self) -> dict:
        with self._lock:
            out = self._summarize(self._stats)
            out["requests"] = self._stats["requests"]
            if len(self._bucket_stats) > 1:
                out["per_bucket"] = {
                    str(L): self._summarize(s)
                    for L, s in self._bucket_stats.items()}
            return out

    def close(self, drain: bool = True) -> None:
        """Stop the dispatcher. ``drain=True`` serves everything already
        queued first; ``drain=False`` fails pending futures."""
        with self._lock:
            self._stop = True
            if not drain:
                for q in self._queues.values():
                    while q:
                        q.popleft().future.set_exception(
                            RuntimeError("engine shut down"))
            self._lock.notify_all()
        self._worker.join(timeout=600.0)
        self._completer.join(timeout=600.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ------------------------------------------------------ dispatcher

    def _run(self):
        while True:
            batch = None
            with self._lock:
                while True:
                    batch = self._pick_batch()
                    if batch is not None or self._stop:
                        break
                    self._lock.wait(timeout=self._wait_budget())
                if batch is None and self._stop:
                    self._inflight.put(None)       # completer sentinel
                    return
            L, reqs = batch
            try:
                self._launch(L, reqs)
            except Exception as e:  # noqa: BLE001 - fulfil futures
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _wait_budget(self) -> Optional[float]:
        """Sleep until the oldest pending request's deadline — or, when
        that deadline has already passed but the batch is being HELD
        because the device pipeline is full (see _pick_batch), sleep
        until the completer frees a slot and notifies."""
        oldest = None
        for q in self._queues.values():
            if q and (oldest is None or q[0].submit_t < oldest):
                oldest = q[0].submit_t
        if oldest is None:
            return None
        rem = oldest + self._max_wait - time.monotonic()
        if rem <= 0:
            return None               # held on a full pipeline: wait for
        return rem                    # the completer's notify

    def _pick_batch(self):
        """Under the lock: choose the bucket whose batch should launch —
        any full tier immediately, else the oldest expired deadline, else
        (when draining) anything left.

        Saturation rule (round-4 on-chip serving bench: 64 blocking
        clients against a 5 ms deadline fragmented batches to 55%
        padding): the deadline only exists so the DEVICE never idles
        waiting for a fuller batch. When the in-flight pipeline is
        already full, dispatching early gains nothing — the batch would
        sit in the queue anyway — so a deadline-expired group is HELD
        and keeps aggregating toward a full tier until the completer
        frees a slot (it notifies the lock). Full tiers still dispatch
        immediately (natural backpressure in _launch), and an idle
        pipeline keeps the deadline semantics, so trickle latency is
        unchanged."""
        now = time.monotonic()
        pipeline_full = self._inflight.full()
        best = None
        for L, q in self._queues.items():
            if not q:
                continue
            full = len(q) >= self._tiers[-1]
            expired = ((now - q[0].submit_t) >= self._max_wait
                       and not pipeline_full)
            if full or expired or self._stop:
                age = now - q[0].submit_t
                if best is None or age > best[1]:
                    best = (L, age)
        if best is None:
            return None
        L = best[0]
        q = self._queues[L]
        n = min(len(q), self._tiers[-1])
        return L, [q.popleft() for _ in range(n)]

    def _launch(self, L: int, reqs):
        """Dispatcher side: pad to the tier, dispatch asynchronously,
        hand the in-flight device result to the completer (blocks when
        the pipeline is full — natural backpressure)."""
        tier = next(t for t in self._tiers if t >= len(reqs))
        n = len(reqs)
        emb = np.stack([r.emb for r in reqs] +
                       [reqs[-1].emb] * (tier - n))
        seeds = np.array([r.seed for r in reqs] + [0] * (tier - n),
                         dtype=np.uint32)
        cfg = np.array([r.cfg for r in reqs] +
                       [self._default_cfg] * (tier - n), dtype=np.float32)
        out = self._dispatch_async(L, tier, seeds, cfg, emb)
        self._inflight.put((L, tier, reqs, out))

    def _complete_loop(self):
        """Completer side: host-sync each in-flight batch (the only
        reliable sync through the tunnel), account stats, fulfil
        futures. Runs until the dispatcher's shutdown sentinel."""
        while True:
            item = self._inflight.get()
            with self._lock:
                # a pipeline slot just freed: wake the dispatcher in case
                # it is holding a deadline-expired batch (see _pick_batch)
                self._lock.notify_all()
            if item is None:
                return
            L, tier, reqs, out = item
            try:
                series = np.asarray(out)
            except Exception as e:  # noqa: BLE001 - surface to futures
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            n = len(reqs)
            t_done = time.monotonic()
            with self._lock:
                self._stats["batches"] += 1
                self._stats["served_rows"] += n
                self._stats["padded_rows"] += tier - n
                bs = self._bucket_stats[L]
                bs["batches"] += 1
                bs["served_rows"] += n
                bs["padded_rows"] += tier - n
                for r in reqs:
                    self._stats["latencies"].append(t_done - r.submit_t)
                    bs["latencies"].append(t_done - r.submit_t)
                # bound the window: a long-running server must not leak
                if len(self._stats["latencies"]) > 20_000:
                    del self._stats["latencies"][:10_000]
                if len(bs["latencies"]) > 20_000:
                    del bs["latencies"][:10_000]
            for i, r in enumerate(reqs):
                r.future.set_result(GenerationResult(
                    series=series[i], seed=r.seed, out_length=L,
                    cfg_scale=r.cfg, latency_s=t_done - r.submit_t,
                    batch_size=tier, batched_with=n))

    def _dispatch_arrays(self, L, tier, seeds, cfg, emb) -> np.ndarray:
        return np.asarray(self._dispatch_async(L, tier, seeds, cfg, emb))

    def _dispatch_async(self, L, tier, seeds, cfg, emb):
        seeds, cfg, emb = (jnp.asarray(seeds), jnp.asarray(cfg),
                           jnp.asarray(emb))
        if (self._plan is not None and self._plan.n_data > 1
                and tier % self._plan.n_data == 0):
            from t2ms_tpu.parallel.mesh import data_sharding
            mesh = self._plan.mesh
            seeds = jax.device_put(seeds, data_sharding(mesh, 1))
            cfg = jax.device_put(cfg, data_sharding(mesh, 1))
            emb = jax.device_put(emb, data_sharding(mesh, emb.ndim))
        with self._dispatch_lock:
            # async: returns a device array immediately; the completer
            # (or _dispatch_arrays for warmup) host-syncs it
            return self._samplers[(L, tier)](
                self._params, self._vae_params, seeds, cfg, emb)
