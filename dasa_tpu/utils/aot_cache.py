"""AOT executable cache: skip the remote recompile on warm starts.

The persistent JAX compile cache cannot capture executables compiled
through the axon remote-compile service (BENCH_NOTES.md), so every
process start pays multi-minute XLA compiles for the two rollout-grad
programs.  `jax.experimental.serialize_executable` CAN serialize the
loaded executables on this toolchain (verified by
scripts/try_aot_cache.py), so we cache them ourselves:

- key = sha256(dasa_tpu source tree, jax version, device kind, program
  name, config json, argument shapes/dtypes).  Any source edit, shape
  change, or toolchain change invalidates the entry — the executable is
  bit-tied to the program it was compiled from, so the fingerprint must
  be conservative.
- hit: deserialize_and_load (seconds) and call the Compiled object
  directly; miss: one `jitted.lower(args).compile()` (the same single
  compile the jit dispatch would do), then serialize to disk.

Disable with DASA_AOT_CACHE=0.  Single-device programs only — sharded
programs embed device assignments that are not portable.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Optional

import jax

_SCHEMA = 1
_src_fingerprint: Optional[str] = None


def cache_dir() -> str:
    return os.environ.get(
        "DASA_AOT_CACHE_DIR",
        os.path.join(os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                    "/root/repo/.jax_cache"), "aot"))


def enabled() -> bool:
    return os.environ.get("DASA_AOT_CACHE", "1") == "1"


def source_fingerprint() -> str:
    """Hash of every .py file in the dasa_tpu package (content, sorted
    paths) — cheap (<100 ms) and catches any code change."""
    global _src_fingerprint
    if _src_fingerprint is None:
        import dasa_tpu

        root = os.path.dirname(os.path.abspath(dasa_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for name in sorted(filenames):
                if name.endswith(".py"):
                    p = os.path.join(dirpath, name)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _src_fingerprint = h.hexdigest()
    return _src_fingerprint


def _args_signature(args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = [str(treedef)]
    for leaf in leaves:
        sig.append(f"{jax.numpy.shape(leaf)}:{jax.numpy.result_type(leaf)}")
    return "|".join(sig)


def load_or_compile(name: str, jitted, args: tuple,
                    extra_key: str = "") -> Any:
    """Return a callable for `jitted` at these arg shapes: the cached
    deserialized executable on a hit, else freshly compiled (and cached
    for the next process).  Falls back to the plain jitted function if
    serialization is unavailable."""
    if not enabled():
        return jitted
    try:
        from jax.experimental import serialize_executable as se
    except ImportError:
        return jitted
    dev = jax.devices()[0]
    key_material = "\n".join([
        f"schema={_SCHEMA}", f"jax={jax.__version__}",
        f"device={getattr(dev, 'device_kind', str(dev))}",
        f"platform={dev.platform}", f"name={name}", f"extra={extra_key}",
        f"src={source_fingerprint()}", _args_signature(args),
    ])
    key = hashlib.sha256(key_material.encode()).hexdigest()[:20]
    path = os.path.join(cache_dir(), f"{name}-{key}.aotx")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                blob, in_tree, out_tree = pickle.load(f)
            return se.deserialize_and_load(blob, in_tree, out_tree)
        except Exception as e:  # stale/corrupt entry: recompile
            print(f"NOTICE: aot cache load failed for {name} "
                  f"({type(e).__name__}: {e}); recompiling", flush=True)
    compiled = jitted.lower(*args).compile()
    try:
        payload = se.serialize(compiled)
        os.makedirs(cache_dir(), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
    except Exception as e:
        print(f"NOTICE: aot cache save failed for {name} "
              f"({type(e).__name__}: {e})", flush=True)
    return compiled
