"""The UPT layout-cliff fingerprint (VERDICT r3 #5).

The ~25% fused-UPT regression under bf16 weight precast / text truncation is
scoped off MODALITY="multi" (runtime.py, multimodal.py) on the strength of
on-chip timings (benchmarks/bisect_upt.py).  benchmarks/fingerprint_upt_cliff.py
captures WHAT the compiler does differently — the compiled-module structural
histogram of the production program vs the two tipped variants — and records
it in benchmarks/upt_cliff_fingerprint.json.  These tests pin

  (a) the histogram extractor itself (it must keep parsing compiled dumps the
      same way, or the recorded fingerprint silently loses meaning), and
  (b) the recorded v5e relationships that define "tipped", so a toolchain
      bump re-running the fingerprint script shows up as a JSON diff a test
      reads — not as an unexplained bench regression.

Refreshing after a toolchain bump (on a chip):
    for v in base precast truncate; do
        python benchmarks/fingerprint_upt_cliff.py $v /tmp/upt_cliff; done
    python benchmarks/fingerprint_upt_cliff.py --analyze /tmp/upt_cliff
"""

import importlib.util
import json
import sys
from pathlib import Path

BENCH_DIR = Path(__file__).resolve().parents[1] / "benchmarks"


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "fingerprint_upt_cliff", BENCH_DIR / "fingerprint_upt_cliff.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


SNIPPET = """\
HloModule jit_fused, is_scheduled=true

%fused_computation (param_0: bf16[256,50,768]) -> bf16[256,768] {
  ...
}

ENTRY %main.42 (Arg_0.1: f32[16,512]) -> (f32[50], f32[50,16,512]) {
  %Arg_0.1 = f32[16,512]{1,0:T(8,128)} parameter(0)
  %convert.7 = bf16[16,512]{1,0:T(8,128)(2,1)} convert(%Arg_0.1)
  %copy.3 = bf16[16,512]{0,1:T(8,128)(2,1)} copy(%convert.7)
  %transpose.9 = bf16[512,16]{1,0:T(8,128)(2,1)} transpose(%copy.3), dimensions={1,0}
  %dot.11 = f32[512,512]{1,0:T(8,128)} dot(%transpose.9, %transpose.9), lhs_contracting_dims={1}, rhs_contracting_dims={1}
  %bitcast.2 = f32[262144]{0:T(1024)} bitcast(%dot.11)
  %fusion.5 = bf16[256,768]{1,0:T(8,128)(2,1)} fusion(%dot.11), kind=kLoop, calls=%fused_computation
  %fusion.6 = bf16[256,768]{1,0:T(8,128)(2,1)} fusion(%dot.11), kind=kOutput, calls=%fused_computation
  %custom-call.1 = bf16[8,128]{1,0} custom-call(%fusion.5), custom_call_target="tpu_custom_call"
}
"""


def test_structural_histogram_counts_opcodes_and_fusion_kinds():
    mod = _load_module()
    h = mod.structural_histogram(SNIPPET)
    assert h["ops"]["convert"] == 1
    assert h["ops"]["copy"] == 1
    assert h["ops"]["transpose"] == 1
    assert h["ops"]["bitcast"] == 1
    assert h["ops"]["dot"] == 1
    assert h["ops"]["fusion"] == 2
    assert h["ops"]["kLoop"] == 1
    assert h["ops"]["kOutput"] == 1
    assert h["ops"]["custom-call"] == 1
    # dot shapes keyed by result type+shape+layout: layout churn is visible
    assert list(h["dot_shapes"]) == ["f32[512,512]{1,0:T(8,128)}"]


def test_histogram_ignores_names_and_schedule_noise():
    """Renaming instructions / reordering lines must not change the counts."""
    mod = _load_module()
    renamed = SNIPPET.replace(".7", ".700").replace(".3", ".303")
    lines = renamed.splitlines()
    shuffled = "\n".join(lines[::-1])
    assert mod.structural_histogram(renamed)["ops"] == \
        mod.structural_histogram(SNIPPET)["ops"]
    assert mod.structural_histogram(shuffled)["ops"] == \
        mod.structural_histogram(SNIPPET)["ops"]


def test_recorded_fingerprint_invariants():
    """The checked-in v5e fingerprint must keep the structural relationships
    that define the cliff scoping (if a toolchain bump + refresh flips any of
    them, this fails -> re-measure bisect_upt.py and revisit the scoping in
    runtime.py / multimodal.py):

    - precast: the matmul result-layout multiset is IDENTICAL to base — the
      25-40% slowdown is NOT a matmul re-layout.  What changes is operand
      formation: base converts fp32 master weights to bf16 in-program and
      feeds matmuls through zero-copy ConcatBitcast custom-calls; precast
      loses ~20% of those (410 -> 328) along with the converts.
    - truncate: the text-attention matmul layouts flip their minor-most dims
      (T=16 packs an (8,128) tile at 1/8 lane occupancy), and the compiler
      compensates with +25% explicit copies in the scan body (287 -> 359).
    """
    p = BENCH_DIR / "upt_cliff_fingerprint.json"
    data = json.loads(p.read_text())
    assert data["backend"] == "tpu"
    variants = data["variants"]
    assert set(variants) == {"base", "precast", "truncate"}
    base = variants["base"]
    for name in ("precast", "truncate"):
        assert variants[name] != base, (
            f"{name} compiles identically to base now — the layout cliff has "
            "moved; re-measure bisect_upt.py and revisit the modality scoping "
            "(runtime.py precast gate, multimodal.py untruncated ids)"
        )
    cb = {v: variants[v]["custom_call_targets"].get("ConcatBitcast", 0)
          for v in variants}
    assert variants["precast"]["dot_shapes"] == base["dot_shapes"], (
        "precast now re-layouts the matmuls themselves — new failure mode, "
        "re-run bisect_upt.py"
    )
    assert variants["precast"]["ops"]["convert"] < base["ops"]["convert"]
    assert cb["precast"] < cb["base"], "operand-formation signature changed"
    assert variants["truncate"]["ops"]["copy"] > base["ops"]["copy"], (
        "truncate no longer inserts extra copies — the tile-packing cliff "
        "may be gone; re-measure before keeping the untruncated UPT ids"
    )
    assert variants["truncate"]["dot_shapes"] != base["dot_shapes"]
