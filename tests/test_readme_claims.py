"""README measured-claim consistency (VERDICT r4 item 6).

Rounds 2-4 each found README advertising stale parity/bench/test-count
figures. README's volatile claims now live in auto-generated marker blocks
(scripts/sync_readme.py); these tests re-render each block from its source
of truth and fail when README drifts, so staleness breaks CI instead of
recurring.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

import sync_readme  # noqa: E402

README = (REPO / "README.md").read_text()


def block(tag: str) -> str:
    m = re.search(
        rf"<!-- auto:{tag} -->\n(.*?)\n<!-- /auto:{tag} -->", README, re.S
    )
    assert m, f"README.md lost its auto:{tag} marker block"
    return m.group(1)


def test_bench_block_matches_latest_bench_json():
    assert block("bench") == sync_readme.render_bench()


def test_parity_block_matches_parity_md():
    assert block("parity") == sync_readme.render_parity()


def test_parity_renderer_sees_the_verdict_table():
    # guard the renderer itself: if PARITY.md's table format changes and the
    # regex matches nothing, the README block would go stale silently
    assert "dmAP50" in sync_readme.render_parity()


def test_tests_block_matches_collected_count(request):
    items = request.session.items
    if len(items) < 700:
        pytest.skip("partial run — full-suite collection required for count")
    m = re.search(r"# (\d+) collected tests", block("tests"))
    assert m, "README tests block lost its count"
    assert int(m.group(1)) == len(items), (
        f"README claims {m.group(1)} tests, suite collected {len(items)} — "
        "run scripts/sync_readme.py"
    )
