"""Disk cache of serialized XLA executables — the cold-start killer.

The persistent XLA compilation cache does not work on the axon TPU platform
(the cache dir stays empty; CLAUDE.md), so every fresh process repaid full
jit warmup — BENCH_r02 measured a 226 s cold start before frame 1 of a
"live" transcode.  ``jax.experimental.serialize_executable`` DOES work
there (measured on this host: fresh-process ``deserialize_and_load`` of the
fused transcode kernel at bench shapes = 0.1 s vs 3.8 s compile + tunnel
round trips), so we persist compiled executables ourselves.

``aot_jit(fn, static_argnames=...)`` is a drop-in for
``jax.jit(fn, static_argnames=...)``:

 * off-TPU (CPU tests, virtual meshes) it IS plain ``jax.jit`` — the CPU
   backend compiles in milliseconds and byte-level pickles would only add
   a new failure surface there;
 * on TPU, each (function, static args, input avals) compiles once per
   cache lifetime; later processes load the serialized executable from
   ``RBV_AOT_DIR`` (default /tmp/rabbit_aot).  Keys include the jax
   version and device kind so stale artifacts never load; any
   deserialize/run failure silently falls back to a fresh compile.

Set ``RBV_AOT=0`` to disable.
"""

from __future__ import annotations

import hashlib
import inspect
import os
import pickle
import threading

import jax

_CACHE_DIR = os.environ.get("RBV_AOT_DIR", "/tmp/rabbit_aot")
_mem: dict[str, object] = {}
_lock = threading.Lock()


def _enabled() -> bool:
    if os.environ.get("RBV_AOT", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _aval_sig(v) -> str:
    shape = getattr(v, "shape", None)
    if shape is None:
        return f"py:{type(v).__name__}:{v!r}"
    dtype = getattr(v, "dtype", None)
    weak = getattr(v, "weak_type", False)
    return f"{tuple(shape)}:{dtype}:{int(bool(weak))}"


def _key(name: str, statics: tuple, traced_vals: list) -> str:
    dev = jax.devices()[0]
    h = hashlib.md5()
    h.update(jax.__version__.encode())
    h.update(f"|{jax.default_backend()}|{dev.device_kind}|{name}|".encode())
    h.update(repr(statics).encode())
    for v in traced_vals:
        h.update(_aval_sig(v).encode())
        h.update(b"|")
    return f"{name}_{h.hexdigest()[:20]}"


def _log(msg: str) -> None:
    if os.environ.get("RBV_AOT_LOG", "1") != "0":
        import sys
        import time

        print(f"aot[{time.strftime('%H:%M:%S')}]: {msg}", file=sys.stderr,
              flush=True)


def _load_or_compile(key: str, fn, statics: dict, traced_vals: list):
    import time

    from jax.experimental import serialize_executable as se

    path = os.path.join(_CACHE_DIR, key + ".pkl")
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            exe = se.deserialize_and_load(payload, in_tree, out_tree)
            _log(f"loaded {key} in {time.perf_counter() - t0:.1f}s")
            return exe
        except Exception:
            try:
                os.remove(path)  # stale/corrupt artifact: recompile below
            except OSError:
                pass

    def closed(*args):
        return fn(*args, **statics)

    t0 = time.perf_counter()
    compiled = jax.jit(closed).lower(*traced_vals).compile()
    _log(f"compiled {key} in {time.perf_counter() - t0:.1f}s")
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)
    except Exception:
        pass  # serialization is an optimization; never fail the call
    return compiled


def aot_jit(fn, static_argnames: tuple = (), name: str | None = None):
    """``jax.jit`` drop-in that persists compiled TPU executables to disk."""
    static_argnames = tuple(
        [static_argnames] if isinstance(static_argnames, str)
        else static_argnames
    )
    jitted = jax.jit(fn, static_argnames=static_argnames)
    sig = inspect.signature(fn)
    fname = name or getattr(fn, "__name__", "fn")

    def wrapper(*args, **kwargs):
        if not _enabled():
            return jitted(*args, **kwargs)
        try:
            bound = sig.bind(*args, **kwargs)
        except TypeError:
            return jitted(*args, **kwargs)
        statics = {
            k: v for k, v in bound.arguments.items() if k in static_argnames
        }
        traced = [
            v for k, v in bound.arguments.items() if k not in static_argnames
        ]
        key = _key(fname, tuple(sorted(statics.items())), traced)
        exe = _mem.get(key)
        if exe is None:
            with _lock:
                exe = _mem.get(key)
                if exe is None:
                    try:
                        exe = _load_or_compile(key, fn, statics, traced)
                    except Exception:
                        exe = None
                    if exe is None:
                        _mem[key] = jitted  # permanent fallback for this key
                        return jitted(*args, **kwargs)
                    _mem[key] = exe
        if exe is jitted:
            return jitted(*args, **kwargs)
        try:
            return exe(*traced)
        except Exception:
            # aval/layout mismatch or backend hiccup: fall back hard
            _mem[key] = jitted
            return jitted(*args, **kwargs)

    wrapper.__name__ = fname
    return wrapper
