"""Production serving: one warm compiled sampler behind a micro-batching HTTP front end.

The reference has no serving story — its interactive use is a per-tile Python loop with a
host round trip per tile (``/root/reference/BaseModel/evaluateCN.py:66-120``). A TPU-native
server has different constraints: XLA executables are shape-specialized and expensive to
compile, and the MXU wants large batches. So the server

* compiles ONE fixed-shape sampler executable at startup (batch, size, steps, sampler and
  speed knobs are server-level settings, not request parameters) and keeps it warm,
* micro-batches concurrent requests into that executable: a dispatcher thread collects up
  to ``batch`` requests within ``max_wait_ms`` and issues a single device dispatch
  (under-full batches are padded by replicating the first request — the XLA program shape
  never changes),
* gives every request its OWN deterministic initial latent (``z_init`` derived from the
  request seed, ``jax.vmap`` over per-item PRNG keys), so a response is bit-identical
  whether the request rode alone or shared a batch — batching is invisible to clients.

Request data (prompt tokens, seg hint, seed) stays per-item; everything shape-like is
pinned. The HTTP layer is stdlib-only (``http.server``): POST /stylize, GET /healthz,
GET /metrics.
"""
from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np


@dataclass(frozen=True)
class ServeConfig:
    """Server-level (compile-time) sampling settings. One executable per server."""

    batch: int = 4
    size: int = 512
    steps: int = 50
    scale: float = 7.5
    sampler: str = "ddim"  # ddim | dpm | consistency
    cfg_interval: int = 1
    deep_cache_interval: int = 1
    max_wait_ms: float = 50.0
    # consistency-student head parameters (from the distill run's meta)
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0


def build_runner(params, cfg, sched, sc: ServeConfig, attn_fn=None) -> Callable:
    """Compile the fixed-shape batched sampler.

    Returns ``runner(seg[B,H,W,3] float01, ids[B,L], mask[B,L], seeds[B] int32) ->
    uint8[B,H,W,3]``. The initial latent is generated per item from the request seed, so
    item ``i`` of the output depends only on request ``i``.
    """
    import jax
    import jax.numpy as jnp

    from topomap_tpu.core import DDIMConfig
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.ops.image import from_signed
    from topomap_tpu.pipeline import encode_text, sample, sample_consistency

    attn = attn_fn or best_attention_fn()
    ds = cfg.vae.downscale
    zshape = (sc.size // ds, sc.size // ds, cfg.unet.in_channels)
    ddim = DDIMConfig(
        num_steps=sc.steps,
        guidance_scale=sc.scale,
        eta=0.0,
        cfg_interval=sc.cfg_interval,
        deep_cache_interval=sc.deep_cache_interval,
        solver="dpm" if sc.sampler == "dpm" else "ddim",
    )

    def fn(params, seg, ids, mask, seeds):
        z = jax.vmap(lambda s: jax.random.normal(jax.random.PRNGKey(s), zshape, jnp.float32))(seeds)
        c = encode_text(params, cfg, ids, mask)
        if sc.sampler == "consistency":
            img = sample_consistency(
                params, cfg, sched, sc.steps, jax.random.PRNGKey(0), seg, c,
                attn_fn=attn, decode_dtype=jnp.bfloat16,
                sigma_data=sc.sigma_data, timestep_scaling=sc.timestep_scaling,
                z_init=z,
            )
        else:
            img = sample(
                params, cfg, sched, ddim, jax.random.PRNGKey(0), seg, c,
                attn_fn=attn, decode_dtype=jnp.bfloat16, z_init=z,
            )
        return from_signed(img)

    jitted = jax.jit(fn)

    def runner(seg, ids, mask, seeds):
        out = jitted(
            params,
            jnp.asarray(seg, jnp.float32),
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(seeds, jnp.int32),
        )
        return np.asarray(jax.device_get(out))

    return runner


class _Pending:
    __slots__ = ("seg", "ids", "mask", "seed", "event", "result", "error", "t0", "occupancy")

    def __init__(self, seg, ids, mask, seed):
        self.seg, self.ids, self.mask, self.seed = seg, ids, mask, seed
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.t0 = time.perf_counter()
        self.occupancy = 0


class MicroBatcher:
    """Collects concurrent requests into fixed-size device batches.

    The dispatcher blocks on the first request, then waits up to ``max_wait_ms`` for
    companions (up to ``batch``); short batches are padded with replicas of the first
    item — per-item ``z_init`` makes the padding invisible to results.
    """

    def __init__(self, runner: Callable, batch: int, max_wait_ms: float = 50.0):
        self._runner = runner
        self._batch = batch
        self._wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self.requests = 0
        self.batches = 0
        self.occupancy_sum = 0
        self.latencies_ms: list[float] = []  # bounded at 1024
        self._stop = object()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, seg, ids, mask, seed, timeout: float = 600.0) -> np.ndarray:
        p = _Pending(seg, ids, mask, seed)
        self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("stylize request timed out")
        if p.error is not None:
            raise p.error
        with self._lock:
            self.requests += 1
            self.latencies_ms.append((time.perf_counter() - p.t0) * 1000.0)
            if len(self.latencies_ms) > 1024:
                del self.latencies_ms[: -1024]
        return p.result

    def close(self):
        self._q.put(self._stop)
        self._thread.join(timeout=10)

    def _loop(self):
        while True:
            item = self._q.get()
            if item is self._stop:
                return
            group = [item]
            deadline = time.perf_counter() + self._wait
            while len(group) < self._batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is self._stop:
                    self._q.put(nxt)  # re-queue so close() still terminates the loop
                    break
                group.append(nxt)
            pad = self._batch - len(group)
            first = group[0]
            seg = np.stack([p.seg for p in group] + [first.seg] * pad)
            ids = np.stack([p.ids for p in group] + [first.ids] * pad)
            mask = np.stack([p.mask for p in group] + [first.mask] * pad)
            seeds = np.asarray([p.seed for p in group] + [first.seed] * pad, np.int32)
            try:
                out = self._runner(seg, ids, mask, seeds)
                for i, p in enumerate(group):
                    p.occupancy = len(group)
                    p.result = out[i]
            except BaseException as e:  # surfaced to every waiter in the group
                for p in group:
                    p.error = e
            finally:
                with self._lock:
                    self.batches += 1
                    self.occupancy_sum += len(group)
                for p in group:
                    p.event.set()

    def metrics(self) -> dict:
        with self._lock:
            lat = sorted(self.latencies_ms)
            n = len(lat)
            return {
                "requests": self.requests,
                "batches": self.batches,
                "mean_occupancy": round(self.occupancy_sum / max(1, self.batches), 3),
                "latency_ms_p50": round(lat[n // 2], 1) if n else None,
                "latency_ms_p95": round(lat[int(n * 0.95)], 1) if n else None,
            }


def _png_to_unit(b64: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.NEAREST)  # seg maps: no interpolation
    return np.asarray(img, np.float32) / 255.0


def _unit_to_png(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_http_server(batcher: MicroBatcher, tokenizer, sc: ServeConfig,
                     host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """stdlib HTTP front end. ``port=0`` binds an ephemeral port (``server.server_port``)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route access logs away from stdout
            import sys

            sys.stderr.write("serve: " + fmt % args + "\n")

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "sampler": sc.sampler, "batch": sc.batch,
                                 "size": sc.size, "steps": sc.steps})
            elif self.path == "/metrics":
                self._json(200, batcher.metrics())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/stylize":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req.get("prompt", "")
                if "seg_png_b64" not in req:
                    raise ValueError("missing seg_png_b64")
                seg = _png_to_unit(req["seg_png_b64"], sc.size)
                seed = int(req.get("seed", 0))
                ids, mask = tokenizer.encode([prompt])
                t0 = time.perf_counter()
                out = batcher.submit(seg, np.asarray(ids)[0], np.asarray(mask)[0], seed)
                self._json(200, {
                    "image_png_b64": _unit_to_png(out),
                    "latency_ms": round((time.perf_counter() - t0) * 1000.0, 1),
                })
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
