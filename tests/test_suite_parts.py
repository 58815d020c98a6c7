"""Guard for the documented 3-part suite split (CLAUDE.md: each part must
be runnable in <= 10 min): every test file is in exactly one part, so
`--suite-part 1` + 2 + 3 together run the whole suite."""

import pathlib

from .conftest import SUITE_PARTS


def test_parts_cover_all_files():
    here = pathlib.Path(__file__).parent
    all_files = {p.name for p in here.glob("test_*.py")}
    named = [f for files in SUITE_PARTS.values() for f in files]
    assert len(named) == len(set(named)), "file listed in two parts"
    missing = set(named) - all_files
    assert not missing, f"SUITE_PARTS names nonexistent files: {missing}"
    # everything unnamed implicitly belongs to part 3 — nothing to assert
    # beyond the two invariants above; this test documents the contract.
