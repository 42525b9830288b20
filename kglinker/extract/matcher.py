"""Per-conversation mention extraction + disambiguation + coreference.

This is the engine's single UDF family (SURVEY §2.10): the whole
per-document pipeline of ``/root/reference/ner_cz.py:1542-1678``
(``recognize()``) re-expressed as one pure function over an ordered list of
turns, executed distributed via ``applyInPandas`` grouped by ``conv_id``.
Grouped-map is *required* — not a compromise — because the reference's
D5/D7/D8 semantics are order-dependent within a document: later mentions see
earlier disambiguation choices (``ner_cz.py:402-408``), fragment coref binds
to the nearest *preceding* mention (``ner_cz.py:1437-1446``), pronoun coref
is a running male/female state machine (``ner_cz.py:411-491``). A
conversation is the reference's "document"; a turn is its "paragraph"
(SURVEY §1.1).

Stage map (reference → here):
 M11 sanitize        ner_cz.py:1577        → _sanitize (offset-preserving)
 M2/M7 matching      figa_cedar.tpp:906    → Automaton.find_matches
 M10 nationality     ner_cz.py:1602-1608   → context-only tokens
 M8/M9 dates         dates.py:349-411      → find_dates + overlap drop
 D3 static argmax    ner_cz.py:332-338     → candidates[0] (A2 pre-sorted,
                                             first-max tie-break = reference
                                             list.index(max))
 A6/D4/D5 context    ner_cz.py:633-1011    → _context_score with running
                                             chosen-name feedback
 D6 fixup            ner_cz.py:1238-1269   → nearest same-surface strong
 D7 fragment coref   ner_cz.py:1409-1426   → subname_map + nearest
                                             preceding person
 D8 pronoun coref    ner_cz.py:411-491     → last male/female state
 D9 back-off         ner_cz.py:1429-1432   → static prior fallback
 D10 unknown names   process_outputs.py:287-344 → _find_unknown_names
                     (capitalized-run scan, overlap-absorb, negative
                      synthetic ids ner_cz.py:1295-1305)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from kglinker.automaton.build import KBArtifacts
from kglinker.extract.dates import find_dates

__all__ = ["MentionRow", "annotate_conversation", "MENTIONS_SCHEMA_DDL"]

MENTIONS_SCHEMA_DDL = (
    "conv_id string, turn_idx int, start int, end int, mention_type string, "
    "surface string, kb_id long, resolved string"
)

_SANITIZE = re.compile(r"[;\x00-\x1f]")


def _sanitize(text: str) -> str:
    """M11: same-length char-class → space keeps offsets valid against the
    *stored* text (the per-turn text-equality invariant: stored text is
    never rewritten)."""
    if _SANITIZE.search(text) is None:  # common case: no copy
        return text
    return _SANITIZE.sub(" ", text)


@dataclass
class MentionRow:
    conv_id: str
    turn_idx: int
    start: int
    end: int
    mention_type: str   # kb | date | interval | coref
    surface: str
    kb_id: int | None   # resolved entity (antecedent for coref); None for dates
    resolved: str


def _year(datestr: str) -> str:
    return datestr[:4] if datestr else ""


_CAP_RUN = re.compile(
    r"(?<![\w'])[A-ZÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ][\w']+(?: [A-ZÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ][\w']+)+")


def _find_unknown_names(text: str, taken: list[tuple[int, int]],
                        name_registry: dict[str, int]) -> list[tuple[int, int, str, int]]:
    """D10 (optional `-n` mode): heuristic capitalized-run scanner
    (``name_recognizer/process_outputs.py:287-344`` find_full_names) for
    person-like names absent from the KB. Runs overlapping known mentions
    are absorbed (ner_cz.py:1307-1330); new names get negative synthetic
    sense ids, stable per conversation (ner_cz.py:1295-1305)."""
    out = []
    for m in _CAP_RUN.finditer(text):
        s, e = m.span()
        if any(not (e <= ts or s >= te) for ts, te in taken):
            continue
        surface = m.group(0)
        if surface not in name_registry:
            name_registry[surface] = -(len(name_registry) + 1)
        out.append((s, e, surface, name_registry[surface]))
    return out


def annotate_conversation(conv_id: str,
                          turns: list[tuple[int, str]],
                          art: KBArtifacts,
                          detect_unknown_names: bool = False,
                          case_insensitive: bool = False) -> list[MentionRow]:
    """Annotate one conversation. ``turns`` must be (turn_idx, text) sorted
    by turn_idx (the stable ordering invariant).

    ``case_insensitive`` uses the P5 lowercase automaton variant
    (requires artifacts built with ``lowercase=True``); offsets stay
    anchored to the original text, surfaces keep original casing."""
    auto = art.automaton
    use_lower = case_insensitive and art.lower_automaton is not None
    meta = art.kb_meta
    out: list[MentionRow] = []

    # running cross-turn state (reference: document-scope registers)
    chosen_names: dict[str, int] = {}      # person canonical name → count (D5)
    conv_surfaces_seen: set[str] = set()   # surfaces of all chosen entities
    last_person_by_gender: dict[str, int] = {}   # D8 state
    person_mentions: list[tuple[int, int, int, str]] = []  # (turn, start, kb_id, surface) for D7
    tied_mentions: list[int] = []          # indexes into out needing D6 fixup
    name_registry: dict[str, int] = {}     # D10 surface → negative synthetic id

    for turn_idx, text in turns:
        st = _sanitize(text)
        if use_lower:
            low = st.lower()
            if len(low) == len(st):  # guard rare length-changing lowercasing
                from kglinker.automaton.build import Match
                matches = [Match(m.start, m.end, st[m.start:m.end],
                                 m.kb_ids, m.is_fragment)
                           for m in art.lower_automaton.find_matches(low)]
            else:
                matches = auto.find_matches(st)
        else:
            matches = auto.find_matches(st)
        if not matches and not detect_unknown_names:
            # fast path: only dates possible on this turn
            for d in find_dates(st):
                out.append(MentionRow(conv_id, turn_idx, d.start, d.end,
                                      d.kind, st[d.start:d.end], None,
                                      d.resolved))
            continue

        # split: kb mentions / pronouns / nationality context / fragments
        kb_matches, pronouns, fragments = [], [], []
        turn_nats: set[str] = set()
        for m in matches:
            if m.kb_ids:
                kb_matches.append(m)
            elif m.surface in art.nationality_forms:
                turn_nats.add(m.surface)          # M10: context-only
            elif (m.surface in art.pronouns_male
                  or m.surface in art.pronouns_female):
                pronouns.append(m)
            elif m.is_fragment and m.surface in art.subname_map:
                fragments.append(m)

        # M8/M9: dates not overlapping any accepted entity span
        spans = [(m.start, m.end) for m in matches]
        dates = [d for d in find_dates(st)
                 if not any(not (d.end <= s or d.start >= e) for s, e in spans)]
        turn_years = {_year(d.resolved) for d in dates}

        # per-turn event stream ordered by offset: disambiguation is
        # sequential (D5) so pronouns/fragments see earlier choices
        events: list[tuple[int, str, object]] = []
        events += [(m.start, "kb", m) for m in kb_matches]
        events += [(m.start, "frag", m) for m in fragments]
        events += [(m.start, "pron", m) for m in pronouns]
        events += [(d.start, "date", d) for d in dates]
        if detect_unknown_names:
            taken = spans + [(d.start, d.end) for d in dates]
            events += [(s, "name", (s, e, surf, nid))
                       for s, e, surf, nid in
                       _find_unknown_names(st, taken, name_registry)]
        events.sort(key=lambda e: e[0])

        for start, kind, obj in events:
            if kind == "name":
                s, e_, surf, nid = obj
                out.append(MentionRow(conv_id, turn_idx, s, e_, "name",
                                      surf, nid, str(nid)))
                continue
            if kind == "date":
                out.append(MentionRow(conv_id, turn_idx, obj.start, obj.end,
                                      obj.kind, st[obj.start:obj.end], None,
                                      obj.resolved))
                continue
            if kind == "kb":
                m = obj
                cand = [c for c in m.kb_ids if c in meta]
                if not cand:
                    continue
                if len(cand) > 1:
                    cand = _context_free_filter(cand, meta, st, m.start, m.end)
                if len(cand) == 1:
                    chosen, tied = cand[0], False
                else:
                    chosen, tied = _disambiguate(cand, meta, turn_nats,
                                                 turn_years, chosen_names,
                                                 conv_surfaces_seen)
                row = MentionRow(conv_id, turn_idx, m.start, m.end, "kb",
                                 m.surface, chosen, str(chosen))
                out.append(row)
                if tied:
                    tied_mentions.append(len(out) - 1)
                info = meta[chosen]
                conv_surfaces_seen.add(m.surface)
                if info["type"].startswith("person"):
                    chosen_names[info["name"]] = chosen_names.get(info["name"], 0) + 1
                    person_mentions.append((turn_idx, m.start, chosen, m.surface))
                    if info["gender"]:
                        last_person_by_gender[info["gender"]] = chosen
                continue
            if kind == "frag":
                m = obj
                cand = art.subname_map.get(m.surface, ())
                ante = _nearest_predecessor(person_mentions, turn_idx, m.start,
                                            cand, m.surface)
                if ante is None:
                    if not cand:
                        continue
                    ante = cand[0]          # D9 back-off: static prior
                out.append(MentionRow(conv_id, turn_idx, m.start, m.end,
                                      "coref", m.surface, ante, str(ante)))
                info = meta.get(ante)
                if info and info["gender"]:
                    last_person_by_gender[info["gender"]] = ante
                continue
            if kind == "pron":
                m = obj
                gender = "M" if m.surface in art.pronouns_male else "F"
                ante = last_person_by_gender.get(gender)
                if ante is None:
                    continue                # unresolvable pronoun dropped
                out.append(MentionRow(conv_id, turn_idx, m.start, m.end,
                                      "coref", m.surface, ante, str(ante)))

    _fix_poor_disambiguation(out, tied_mentions)
    return out


_DURING = ("během ", "during ")
_COPULA = re.compile(r"\b(?:byl|byla|je|was|is|were)\b")


def _context_free_filter(cand: list[int], meta: dict, text: str,
                         start: int, end: int) -> list[int]:
    """D2 context-free candidate filters (ner_cz.py:279-317):
    - a ``během``/``during`` left context keeps only event senses;
    - a copula (+ a candidate person's JOBS value) in the trailing
      sentence keeps only those persons.
    Filters only narrow; they never empty the candidate list."""
    left = text[max(0, start - 8):start].lower()
    if any(left.endswith(d) for d in _DURING):
        events = [c for c in cand if meta[c]["type"] == "event"]
        if events:
            return events
    rest = text[end:end + 80]
    cut = rest.find(".")
    rest = (rest[:cut] if cut >= 0 else rest).lower()
    if _COPULA.search(rest):
        by_job = [c for c in cand
                  if meta[c]["type"].startswith("person")
                  and any(j.lower() in rest for j in meta[c]["jobs"])]
        if by_job:
            return by_job
    return cand


def _disambiguate(cand: list[int], meta: dict, turn_nats: set[str],
                  turn_years: set[str], chosen_names: dict[str, int],
                  conv_surfaces: set[str]) -> tuple[int, bool]:
    """D3 static prior + D4 context score; first-max tie-break
    (reference ``list.index(max)``, ner_cz.py:338, :400). Returns
    (chosen, was_tied_on_score)."""
    scores: list[float] = []
    for c in cand:
        info = meta[c]
        static = info["confidence"]
        ctx: list[int] = []
        t = info["type"]
        if t.startswith("person"):
            ctx.append(100 if set(info["nationality"]) & {n.rstrip("ý").capitalize()
                                                          for n in turn_nats} else 0)
            ctx.append(100 if any(_year(d) in turn_years for d in info["dates"]) else 0)
            ctx.append(100 if chosen_names.get(info["name"], 0) > 0 else 0)
        elif t in ("settlement", "country"):
            ctx.append(100 if info["country"] and info["country"] in conv_surfaces else 0)
        elif t in ("organisation", "event"):
            ctx.append(100 if info["location"] and info["location"] in conv_surfaces else 0)
            ctx.append(100 if any(_year(d) in turn_years for d in info["dates"]) else 0)
        # integer division parity (ner_cz.py:815): int mean of sub-scores
        context = sum(ctx) // len(ctx) if ctx else 0
        scores.append(static + context)
    best = max(scores)
    tied = scores.count(best) > 1
    return cand[scores.index(best)], tied


def _nearest_predecessor(person_mentions: list[tuple[int, int, int, str]],
                         turn_idx: int, start: int,
                         cand: tuple[int, ...], fragment: str) -> int | None:
    """D7: nearest preceding person mention whose chosen sense is a
    candidate of this fragment, else whose surface contains the fragment
    (ner_cz.py:1437-1446)."""
    cset = set(cand)
    by_sense = None
    by_surface = None
    for t, s, kb_id, surface in person_mentions:
        if (t, s) >= (turn_idx, start):
            break
        if kb_id in cset:
            by_sense = kb_id
        elif fragment in surface.split(" "):
            by_surface = kb_id
    return by_sense if by_sense is not None else by_surface


def _fix_poor_disambiguation(rows: list[MentionRow], tied: list[int]) -> None:
    """D6: a score-tied mention adopts the sense of the nearest strong
    (untied) mention with the same surface (ner_cz.py:1238-1269)."""
    if not tied:
        return
    tied_set = set(tied)
    strong: dict[str, list[tuple[int, int, int]]] = {}
    for i, r in enumerate(rows):
        if r.mention_type == "kb" and i not in tied_set:
            strong.setdefault(r.surface, []).append((r.turn_idx, r.start, r.kb_id))
    for i in tied:
        r = rows[i]
        cands = strong.get(r.surface)
        if not cands:
            continue
        nearest = min(cands, key=lambda c: (abs(c[0] - r.turn_idx),
                                            abs(c[1] - r.start)))
        rows[i] = MentionRow(r.conv_id, r.turn_idx, r.start, r.end, r.mention_type,
                             r.surface, nearest[2], str(nearest[2]))
