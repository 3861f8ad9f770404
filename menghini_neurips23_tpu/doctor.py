"""Environment self-check: `python -m menghini_neurips23_tpu.doctor`.

Prints one line per subsystem so a user can see, before launching a grid,
whether they are about to run on real weights, a real tokenizer, a real
accelerator, and warm caches.  Exit code 0 always (it reports, not gates).
"""

from __future__ import annotations

import os
import sys


def _line(name: str, ok: bool, detail: str) -> None:
    print(f"[{'ok' if ok else '--'}] {name:<18} {detail}")


def main(argv=None) -> int:
    # 1. backend / devices (first device touch may pay a cold-claim delay)
    import jax

    devices = jax.devices()
    _line(
        "backend",
        devices[0].platform == "tpu",
        f"{jax.default_backend()} ({len(devices)} device(s): {devices[0].device_kind})",
    )

    # 2. CLIP weights
    ckpt = os.environ.get("CLIP_CKPT", "")
    if ckpt and os.path.exists(ckpt):
        _line("clip weights", True, ckpt)
    elif ckpt:
        _line("clip weights", False, f"CLIP_CKPT={ckpt} DOES NOT EXIST")
    else:
        _line(
            "clip weights", False,
            "CLIP_CKPT unset - runs use RANDOM weights (throughput only)",
        )

    # 3. tokenizer
    bpe = os.environ.get("BPE_PATH", "") or os.environ.get("CLIP_BPE_PATH", "")
    if bpe and os.path.exists(bpe):
        _line("tokenizer", True, f"CLIP BPE merges: {bpe}")
    else:
        _line(
            "tokenizer", False,
            "no BPE merges (BPE_PATH/CLIP_BPE_PATH) - byte-level fallback vocab",
        )

    # 4. native extensions (build on first use)
    from menghini_neurips23_tpu.data._native import get_fastloader, get_leaderboard

    _line("native loader", get_fastloader() is not None, "C++ threaded image decode")
    _line("native leaderboard", get_leaderboard() is not None, "C++ exact top-K cascade")

    # 5. compile cache
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
    if ddir:
        _line("dataset dir", os.path.isdir(ddir), ddir)
    else:
        _line("dataset dir", False, "DATASET_DIR unset")
    return 0


if __name__ == "__main__":
    sys.exit(main())
