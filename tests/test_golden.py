"""Golden parity fixtures: regenerate the frozen RNG/filename surfaces and
diff them against tests/golden/golden.json (VERDICT r2 next-round #9).

These pin the bit-identical-to-reference invariants CLAUDE.md promises:
seeded 62% class splits, few-shot selection (seed-inside-loop quirk),
train/val splits, the leaderboard cascade (including its arrival-order
quirk), and the artifact filename schemas.  A failure here means a refactor
silently broke reference parity - fix the code, don't regenerate the golden
file, unless the break is an intentional, documented parity change."""

import json
from pathlib import Path

GOLDEN = Path(__file__).parent / "golden" / "golden.json"


def test_golden_fixtures_match():
    import sys

    sys.path.insert(0, str(Path(__file__).parent / "golden"))
    from generate import build_golden

    fresh = build_golden()
    stored = json.loads(GOLDEN.read_text())
    assert sorted(fresh) == sorted(stored), "golden sections changed"
    for section in stored:
        assert fresh[section] == stored[section], (
            f"golden section {section!r} drifted - an RNG-parity or filename "
            "invariant broke (see tests/golden/generate.py)"
        )
