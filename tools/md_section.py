"""Shared BENCH/BASELINE.md section splicing for the scale tools.

Each scale tool owns ONE "## <tier> at scale" section and must replace
only it on re-measurement, preserving every other tool's evidence.
Four hand-rolled implementations of that splice existed; one of them
(inc_scale_bench) truncated the file from its own heading and silently
deleted the sections that followed — this helper (plus its pytest) is
the regression guard.
"""

from __future__ import annotations


def replace_section(doc: str, mark: str, section: str) -> str:
    """Return ``doc`` with the section starting at the ``mark`` heading
    (up to the next ``## `` heading or EOF) replaced by ``section``
    IN PLACE (preserving section order), appended at the end if absent.
    All other content is preserved byte-for-byte up to surrounding
    blank-line normalization."""
    if mark in doc:
        pre = doc[: doc.index(mark)]
        rest = doc[doc.index(mark) + len(mark):]
        nxt = rest.find("\n## ")
        post = rest[nxt:] if nxt >= 0 else ""
        out = pre.rstrip() + "\n\n" + section.strip() + "\n"
        if post:
            out += "\n" + post.lstrip("\n")
        return out.rstrip() + "\n"
    return doc.rstrip() + "\n\n" + section.strip() + "\n"
