"""Regression guard for the BENCH/BASELINE.md section splice shared by
the scale tools (tools/md_section.py): a previous hand-rolled variant
truncated the file from its own heading and silently deleted every
evidence section that followed."""

from __future__ import annotations

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "md_section",
    pathlib.Path(__file__).resolve().parent.parent / "tools" / "md_section.py",
)
md_section = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and md_section)

replace_section = md_section.replace_section

DOC = """# HEAD

head prose

## Alpha tier at scale

alpha numbers

## Beta tier at scale

beta numbers

## Gamma tier at scale

gamma numbers
"""


def test_replace_middle_section_preserves_neighbors():
    out = replace_section(DOC, "## Beta tier at scale",
                          "## Beta tier at scale\n\nNEW beta")
    assert "alpha numbers" in out and "gamma numbers" in out
    assert "NEW beta" in out and "beta numbers" not in out
    assert out.count("## Beta tier at scale") == 1


def test_replace_last_section_keeps_head():
    out = replace_section(DOC, "## Gamma tier at scale",
                          "## Gamma tier at scale\n\nNEW gamma")
    assert "head prose" in out and "alpha numbers" in out
    assert "beta numbers" in out and "NEW gamma" in out
    assert "gamma numbers" not in out


def test_absent_mark_appends():
    out = replace_section(DOC, "## Delta tier at scale",
                          "## Delta tier at scale\n\ndelta numbers")
    assert out.startswith("# HEAD")
    assert out.rstrip().endswith("delta numbers")
    assert all(s in out for s in ("alpha numbers", "beta numbers", "gamma numbers"))


def test_replace_keeps_section_order_and_blank_lines():
    # ADVICE round 4: the old splice removed the section in place but
    # re-appended it at EOF, reordering the doc and gluing the preceding
    # prose straight against the next "## " heading.
    out = replace_section(DOC, "## Beta tier at scale",
                          "## Beta tier at scale\n\nNEW beta")
    assert (out.index("alpha numbers")
            < out.index("NEW beta")
            < out.index("gamma numbers"))
    assert "alpha numbers\n\n## Beta" in out
    assert "NEW beta\n\n## Gamma" in out


def test_idempotent():
    sec = "## Beta tier at scale\n\nNEW beta"
    once = replace_section(DOC, "## Beta tier at scale", sec)
    twice = replace_section(once, "## Beta tier at scale", sec)
    assert once == twice
