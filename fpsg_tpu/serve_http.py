"""Dynamic-batching HTTP serving frontend for the few-shot generator.

The reference has no serving story at all (generation is buried in its
eval code, few_shot.py:179-213); a production TPU deployment needs one,
and it needs DYNAMIC BATCHING: a TPU only approaches its MXU rate on
batched work (benchmarks/serve_bench.py: b1 13 clouds/s -> b32 150), but
HTTP requests arrive one at a time. The batcher coalesces concurrent
requests into one device dispatch, padding to a small set of bucket
sizes so every dispatch reuses a compiled executable.

Coalescing is SEMANTICALLY INVISIBLE by construction, not by hope: each
request carries its own RNG key and its own class prototype row, and the
device path (`Generator.generate_keyed` -> `generate_from_proto` with a
(B, F) proto batch + `per_item_template_points`) makes output row i a
pure function of (image i, proto i, key i). A request served inside a
coalesced batch of 32 returns bits identical to the same request served
alone (tests/test_serve_http.py), so batching is purely an ops knob.

Architecture (all stdlib — no framework dependencies):

  HTTP handler threads (ThreadingHTTPServer)
      -> BatchingEngine.submit(image, class_name, key) -> Future
      -> one batcher thread: dequeue, coalesce up to max_batch within
         max_wait_ms, pad to a bucket, ONE generate_keyed dispatch
      -> futures resolve; handler threads write responses.

Endpoints (arrays travel as .npy bodies — `numpy.save` bytes):

  GET  /healthz                         liveness
  GET  /v1/stats                        batching/latency counters (JSON)
  GET  /v1/classes                      registered class names (JSON)
  POST /v1/classes/<name>               body: (S, N, 3) float32 support
                                        clouds -> computes + stores the
                                        class prototype (one PointNet
                                        encode, amortized forever)
  POST /v1/generate?class=<name>[&seed=<int>]
                                        body: (H, W, 3) or (Q, H, W, 3)
                                        uint8 -> (N, 3) / (Q, N, 3)
                                        float32 .npy. Rows of a multi-
                                        image request are submitted
                                        individually (the batcher may
                                        coalesce them with other
                                        requests). With `seed`, row i
                                        uses key (seed + i) — repeatable
                                        bits; without, the server
                                        assigns fresh keys.

Start:  python -m fpsg_tpu.cli.serve --eval_model model_epoch_500 \
            --name run0 --port 8000
"""

from __future__ import annotations

import collections
import itertools
import json
import io
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence, Tuple
from urllib.parse import parse_qs, urlsplit

import numpy as np

__all__ = ["BatchingEngine", "make_server", "key_data_from_seed"]


def key_data_from_seed(seed: int) -> np.ndarray:
    """(2,) uint32 threefry key data from a 64-bit seed — the host-side
    equivalent of ``jax.random.PRNGKey(seed)`` for 32-bit seeds, built
    with no device dispatch (which matters when every request needs a
    key and the device link is the serving bottleneck). For seeds at or
    above 2^32 the high word is KEPT in key word 0, where PRNGKey
    without x64 would truncate it away."""
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    return np.array([seed >> 32, seed & 0xFFFFFFFF], dtype=np.uint32)


class _Pending:
    __slots__ = ("image", "proto", "key_data", "future", "t_submit")

    def __init__(self, image, proto, key_data, future, t_submit):
        self.image = image
        self.proto = proto
        self.key_data = key_data
        self.future = future
        self.t_submit = t_submit


class BatchingEngine:
    """Coalesces concurrent generate requests into bucketed device calls.

    Args:
      generator: a ``fpsg_tpu.serve.Generator`` (or anything with its
        ``generate_keyed(images, proto=, keys=)`` / ``prototype``
        surface, e.g. a quantized generator).
      max_batch: largest coalesced batch (largest bucket).
      max_wait_ms: how long the batcher holds the FIRST request of a
        batch while waiting for more. The latency/throughput dial:
        under load batches fill instantly and this never binds; at low
        rates it bounds added latency.
      buckets: padded dispatch sizes (ascending). Every distinct bucket
        is one compiled executable; defaults to powers of two up to
        ``max_batch``.
      seed: server RNG namespace — word0 of every server-assigned key
        (word1 is a request counter), so distinct servers with distinct
        seeds draw from distinct threefry streams.
    """

    def __init__(self, generator, *, max_batch: int = 32,
                 max_wait_ms: float = 5.0,
                 buckets: Optional[Sequence[int]] = None, seed: int = 0,
                 transient_retries: int = 2):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.gen = generator
        self.transient_retries = int(transient_retries)
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        if buckets is None:
            buckets = [b for b in (1, 2, 4, 8, 16, 32, 64, 128, 256)
                       if b < max_batch] + [max_batch]
        self.buckets = sorted(set(int(b) for b in buckets))
        if self.buckets[-1] != self.max_batch:
            raise ValueError(
                f"largest bucket {self.buckets[-1]} != max_batch "
                f"{self.max_batch}")
        self._protos: Dict[str, np.ndarray] = {}
        self._proto_lock = threading.Lock()
        self._queue: "queue.Queue" = queue.Queue()
        self._counter = itertools.count()
        self._seed = int(seed) & 0xFFFFFFFF
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._n_padded_rows = 0
        self._batch_sizes: collections.Counter = collections.Counter()
        self._latencies: collections.deque = collections.deque(maxlen=1000)
        self._thread: Optional[threading.Thread] = None
        self._stopped = threading.Event()

    # -- class registry ------------------------------------------------

    def register_class(self, name: str, support_clouds: np.ndarray) -> int:
        """Compute and store the class prototype for ``name`` from its
        (S, N, 3) support clouds. Returns the prototype dimension."""
        proto = np.asarray(
            self.gen.prototype(np.asarray(support_clouds, np.float32)),
            dtype=np.float32)
        return self.register_prototype(name, proto)

    def register_prototype(self, name: str, proto: np.ndarray) -> int:
        """Store a precomputed (F,) prototype under ``name``."""
        proto = np.asarray(proto, dtype=np.float32)
        if proto.ndim != 1:
            raise ValueError(f"prototype must be (F,), got {proto.shape}")
        with self._proto_lock:
            self._protos[name] = proto
        return proto.shape[0]

    def classes(self) -> List[str]:
        with self._proto_lock:
            return sorted(self._protos)

    # -- request path ---------------------------------------------------

    def submit(self, image: np.ndarray, class_name: str,
               key_data: Optional[np.ndarray] = None) -> "Future":
        """Enqueue one (H, W, 3) image; resolves to its (N, 3) cloud.

        ``key_data``: optional (2,) uint32 threefry key for repeatable
        bits (see :func:`key_data_from_seed`); otherwise the server
        assigns key [server_seed, request_counter].
        """
        if self._thread is None:
            raise RuntimeError("engine not started")
        with self._proto_lock:
            proto = self._protos.get(class_name)
        if proto is None:
            raise KeyError(f"unknown class {class_name!r}")
        image = np.asarray(image)
        if image.ndim != 3:
            raise ValueError(f"image must be (H, W, 3), got {image.shape}")
        if np.issubdtype(image.dtype, np.integer):
            image = image.astype(np.uint8)
        else:
            image = image.astype(np.float32)
        if key_data is None:
            key_data = np.array(
                [self._seed, next(self._counter) & 0xFFFFFFFF],
                dtype=np.uint32)
        else:
            key_data = np.asarray(key_data, dtype=np.uint32)
            if key_data.shape != (2,):
                raise ValueError(
                    f"key_data must be (2,) uint32, got {key_data.shape}")
        fut: "Future" = Future()
        self._queue.put(_Pending(image, proto, key_data, fut,
                                 time.monotonic()))
        return fut

    # -- batcher ---------------------------------------------------------

    def start(self) -> "BatchingEngine":
        if self._thread is not None:
            raise RuntimeError("engine already started")
        self._stopped.clear()
        self._thread = threading.Thread(
            target=self._loop, name="fpsg-batcher", daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 10.0) -> None:
        if self._thread is None:
            return
        self._stopped.set()
        self._queue.put(None)  # wake the batcher
        self._thread.join(timeout)
        self._thread = None
        # fail any requests still queued (post-stop submits are refused
        # by the _thread check in submit())
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is not None:
                p.future.set_exception(RuntimeError("engine stopped"))

    def _collect(self) -> Optional[List[_Pending]]:
        """Block for the first request, then coalesce until max_batch or
        the max_wait deadline. None = stop signal."""
        first = self._queue.get()
        if first is None or self._stopped.is_set():
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None or self._stopped.is_set():
                # run what we have; the next _collect sees the stop
                self._queue.put(None)
                break
            batch.append(item)
        return batch

    def _run_batch(self, batch: List[_Pending]) -> None:
        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n)
        pad = bucket - n
        # pad rows repeat row 0 with a fixed key: per-item purity
        # (generate_from_proto docstring) means they cannot perturb the
        # real rows, and repeating a live row keeps dtypes/shapes exact.
        images = np.stack([p.image for p in batch]
                          + [batch[0].image] * pad)
        protos = np.stack([p.proto for p in batch]
                          + [batch[0].proto] * pad)
        keys = np.stack([p.key_data for p in batch]
                        + [batch[0].key_data] * pad)
        try:
            # generate_keyed is read-only (nothing donated, keys are
            # per-item inputs), so a retried call is bit-identical —
            # absorb the axon tunnel's transient INVALID_ARGUMENT
            # bursts (train/retry.py; CLAUDE.md platform quirks)
            # instead of failing every coalesced caller at once.
            from fpsg_tpu.train.retry import retry_readonly

            # short cooldown: the batcher thread is the only dispatcher —
            # the default 15 s would stall every bucket and coalesced
            # caller past typical HTTP client timeouts
            out = retry_readonly(
                lambda: self.gen.generate_keyed(
                    images, proto=protos, keys=keys),
                retries=self.transient_retries, cooldown_s=2.0)
        except BaseException as e:  # noqa: BLE001 — routed to callers
            for p in batch:
                if not p.future.cancelled():
                    p.future.set_exception(e)
            return
        t_done = time.monotonic()
        with self._stats_lock:
            self._n_requests += n
            self._n_batches += 1
            self._n_padded_rows += pad
            self._batch_sizes[bucket] += 1
            for p in batch:
                self._latencies.append(t_done - p.t_submit)
        for i, p in enumerate(batch):
            if not p.future.cancelled():
                p.future.set_result(out[i])

    def _loop(self) -> None:
        while not self._stopped.is_set():
            batch = self._collect()
            if batch is None:
                return
            self._run_batch(batch)

    # -- stats -----------------------------------------------------------

    def stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies)
            n = self._n_requests
            b = self._n_batches

            def pct(p):
                return (round(lat[min(len(lat) - 1,
                                      int(p * len(lat)))] * 1e3, 3)
                        if lat else None)

            return {
                "requests": n,
                "batches": b,
                "padded_rows": self._n_padded_rows,
                "mean_batch": round(n / b, 3) if b else None,
                "batch_size_hist": dict(sorted(
                    self._batch_sizes.items())),
                "latency_ms": {"p50": pct(0.50), "p90": pct(0.90),
                               "p99": pct(0.99)},
                "classes": self.classes(),
                "buckets": self.buckets,
                "max_wait_ms": self.max_wait_s * 1e3,
            }


# -- HTTP layer ----------------------------------------------------------


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(arr), allow_pickle=False)
    return buf.getvalue()


def _npy_load(body: bytes) -> np.ndarray:
    return np.load(io.BytesIO(body), allow_pickle=False)


class _Handler(BaseHTTPRequestHandler):
    # engine is attached by make_server()
    engine: BatchingEngine = None  # type: ignore[assignment]
    request_timeout_s: float = 120.0
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    # -- helpers --

    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj) -> None:
        self._send(code, json.dumps(obj).encode(), "application/json")

    def _error(self, code: int, msg: str) -> None:
        self._json(code, {"error": msg})

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n)

    # -- routes --

    def do_GET(self):
        path = urlsplit(self.path).path
        if path == "/healthz":
            self._send(200, b"ok", "text/plain")
        elif path == "/v1/stats":
            self._json(200, self.engine.stats())
        elif path == "/v1/classes":
            self._json(200, {"classes": self.engine.classes()})
        else:
            self._error(404, f"no route {path}")

    def do_POST(self):
        parts = urlsplit(self.path)
        path, q = parts.path, parse_qs(parts.query)
        try:
            if path.startswith("/v1/classes/"):
                self._post_class(path[len("/v1/classes/"):])
            elif path == "/v1/generate":
                self._post_generate(q)
            else:
                self._error(404, f"no route {path}")
        except (ValueError, KeyError) as e:
            self._error(400, str(e))
        except BrokenPipeError:
            pass
        except Exception as e:  # noqa: BLE001 — serving must not crash
            self._error(500, f"{type(e).__name__}: {e}")

    def _post_class(self, name: str) -> None:
        if not name:
            self._error(400, "class name missing")
            return
        arr = _npy_load(self._body())
        if self.headers.get("X-FPSG-Kind", "").lower() == "prototype":
            dim = self.engine.register_prototype(name, arr)
        else:
            if arr.ndim != 3 or arr.shape[-1] != 3:
                self._error(400, f"support clouds must be (S, N, 3), "
                                 f"got {arr.shape}")
                return
            dim = self.engine.register_class(name, arr)
        self._json(200, {"name": name, "dim": dim})

    def _post_generate(self, q: dict) -> None:
        cls = q.get("class", [None])[0]
        if cls is None:
            self._error(400, "missing ?class=<name>")
            return
        imgs = _npy_load(self._body())
        squeeze = imgs.ndim == 3
        if squeeze:
            imgs = imgs[None]
        if imgs.ndim != 4 or imgs.shape[-1] != 3:
            self._error(400, f"images must be (H, W, 3) or (Q, H, W, 3), "
                             f"got {imgs.shape}")
            return
        seed = q.get("seed", [None])[0]
        futs = []
        for i in range(imgs.shape[0]):
            kd = (key_data_from_seed(int(seed) + i)
                  if seed is not None else None)
            futs.append(self.engine.submit(imgs[i], cls, key_data=kd))
        rows = [f.result(timeout=self.request_timeout_s) for f in futs]
        out = np.stack(rows).astype(np.float32)
        self._send(200, _npy_bytes(out[0] if squeeze else out),
                   "application/x-npy")


def make_server(engine: BatchingEngine, host: str = "127.0.0.1",
                port: int = 8000, *, verbose: bool = False
                ) -> ThreadingHTTPServer:
    """Build (but don't run) the HTTP server; ``.serve_forever()`` to
    serve, ``.server_address`` for the bound (host, port). The engine
    must already be started."""
    handler = type("BoundHandler", (_Handler,), {"engine": engine})
    # socketserver's default listen backlog is 5: a burst of concurrent
    # clients (the whole point of a batching frontend) gets kernel RSTs
    # before accept() ever runs. 128 rides the dispatch latency out.
    server_cls = type("FPSGHTTPServer", (ThreadingHTTPServer,),
                      {"request_queue_size": 128})
    srv = server_cls((host, port), handler)
    srv.daemon_threads = True
    srv.verbose = verbose
    return srv
