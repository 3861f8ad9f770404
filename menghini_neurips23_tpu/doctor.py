"""Environment self-check: `python -m menghini_neurips23_tpu.doctor`.

Prints one line per subsystem so a user can see, before launching a grid,
whether they are about to run on real weights, a real tokenizer, a real
accelerator, and warm caches.

Default mode reports only (exit 0 always).  `--strict` gates: non-zero exit
when any check a REPRODUCTION run depends on fails (random weights, missing
BPE merges, no accelerator, missing dataset dir), so `scripts/run_seeds.sh`
can refuse to burn a seed grid on a misconfigured host (REPRODUCE.md
acceptance protocol).  The native-extension and compile-cache checks stay
advisory in strict mode - they affect speed, not results.
"""

from __future__ import annotations

import argparse
import os
import sys


def _line(name: str, ok: bool, detail: str) -> None:
    print(f"[{'ok' if ok else '--'}] {name:<18} {detail}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--strict",
        action="store_true",
        help="exit non-zero when a reproduction-critical check fails "
        "(random weights / missing BPE / no accelerator / missing dataset)",
    )
    args = ap.parse_args(argv)
    failures = []

    def gate(name: str, ok: bool) -> None:
        if not ok:
            failures.append(name)

    # 1. backend / devices (first device touch may pay a cold-claim delay)
    import jax

    devices = jax.devices()
    accel_ok = devices[0].platform == "tpu"
    _line(
        "backend",
        accel_ok,
        f"{jax.default_backend()} ({len(devices)} device(s): {devices[0].device_kind})",
    )
    gate("backend", accel_ok)

    # 2. CLIP weights
    ckpt = os.environ.get("CLIP_CKPT", "")
    if ckpt and os.path.exists(ckpt):
        _line("clip weights", True, ckpt)
    elif ckpt:
        _line("clip weights", False, f"CLIP_CKPT={ckpt} DOES NOT EXIST")
        gate("clip weights", False)
    else:
        _line(
            "clip weights", False,
            "CLIP_CKPT unset - runs use RANDOM weights (throughput only)",
        )
        gate("clip weights", False)

    # 3. tokenizer
    bpe = os.environ.get("BPE_PATH", "") or os.environ.get("CLIP_BPE_PATH", "")
    if bpe and os.path.exists(bpe):
        _line("tokenizer", True, f"CLIP BPE merges: {bpe}")
    else:
        _line(
            "tokenizer", False,
            "no BPE merges (BPE_PATH/CLIP_BPE_PATH) - byte-level fallback vocab",
        )
        gate("tokenizer", False)

    # 4. native extensions (build on first use) - advisory even in strict
    # mode: the pure-Python fallbacks are byte-identical, only slower
    from menghini_neurips23_tpu.data._native import get_fastloader, get_leaderboard

    _line("native loader", get_fastloader() is not None, "C++ threaded image decode")
    _line("native leaderboard", get_leaderboard() is not None, "C++ exact top-K cascade")

    # 5. compile cache - advisory: affects wall-clock, not results
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "") or (
        jax.config.jax_compilation_cache_dir or ""
    )
    if cache:
        n = len(os.listdir(cache)) if os.path.isdir(cache) else 0
        _line("compile cache", True, f"{cache} ({n} entries)")
    else:
        _line(
            "compile cache", False,
            "unset - repeat runs recompile (export JAX_COMPILATION_CACHE_DIR "
            "or set COMPILE_CACHE_DIR; 8.3x faster repeat CLI runs measured)",
        )

    # 6. dataset root
    ddir = os.environ.get("DATASET_DIR", "")
    ddir_ok = bool(ddir) and os.path.isdir(ddir)
    _line("dataset dir", ddir_ok, ddir or "DATASET_DIR unset")
    gate("dataset dir", ddir_ok)

    if args.strict and failures:
        print(f"strict: FAILED ({', '.join(failures)})", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
