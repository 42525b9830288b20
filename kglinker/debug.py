"""Debug tooling: render annotation state as stable per-mention lines
and diff it between runs.

The from-scratch counterpart of the reference's dev aids — the
``debug.py`` print helpers and the ``debugChangesInEntities`` unified
diff of entity state between pipeline phases
(``/root/reference/ner_cz.py:1564-1574``). Here the unit of comparison
is the full annotation of one conversation, diffed across matcher FLAG
toggles (the figa ``-s``/``-a``/``-n``-style opt-ins), artifact builds,
or code versions — which is how an engineer actually asks "what did this
switch change on this input". Pure driver-side strings; nothing here
touches the hot path.
"""

from __future__ import annotations

import difflib

from kglinker.extract.matcher import MentionRow, annotate_conversation

__all__ = ["format_mentions", "diff_mentions", "trace_flag_effects"]

# the matcher's opt-in switches (each silently no-ops when the artifacts
# were built without the matching index — same contract as the matcher)
_FLAGS = ("detect_unknown_names", "case_insensitive", "spellcheck",
          "accent_insensitive", "uri_matching")


def format_mentions(rows: list[MentionRow]) -> list[str]:
    """One stable line per mention, sorted by (turn, start, end, type) —
    the reference's sorted ``str(entity)`` rendering, made deterministic
    enough to diff."""
    out = []
    for r in sorted(rows, key=lambda r: (r.turn_idx, r.start, r.end,
                                         r.mention_type)):
        out.append(f"t{r.turn_idx}:{r.start}-{r.end} {r.mention_type} "
                   f"{r.surface!r} kb={r.kb_id} resolved={r.resolved}")
    return out


def diff_mentions(before: list[MentionRow], after: list[MentionRow],
                  fromfile: str = "before", tofile: str = "after") -> str:
    """Unified diff (context 0) of two annotation states; empty string
    when identical — ``debugChangesInEntities`` as a pure function."""
    a = [line + "\n" for line in format_mentions(before)]
    b = [line + "\n" for line in format_mentions(after)]
    return "".join(difflib.unified_diff(a, b, fromfile=fromfile,
                                        tofile=tofile, n=0))


def trace_flag_effects(conv_id: str, turns: list[tuple[int, str]], art,
                       **base_flags) -> dict[str, str]:
    """Annotate once with ``base_flags``, then once per additional opt-in
    flag; return {flag: unified diff} for every flag that CHANGED the
    annotation (flags with no effect on this input are omitted)."""
    base = annotate_conversation(conv_id, turns, art, **base_flags)
    out: dict[str, str] = {}
    for flag in _FLAGS:
        if base_flags.get(flag):
            continue
        alt = annotate_conversation(conv_id, turns, art,
                                    **{**base_flags, flag: True})
        d = diff_mentions(base, alt, "base", f"+{flag}")
        if d:
            out[flag] = d
    return out
