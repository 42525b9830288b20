"""G8: rule-based Czech declension generator for person names.

Port of the CAPABILITY of the reference's namegen system
(``/root/reference/figa/make_automat/czechnames/namegen.py``, invoked from
``create_cedar.sh:136-142``; per-word ``/``-alternatives are cross-producted
back into full-name variants by ``KB2namelist.py:96-129``
``build_name_variant``). The reference delegates the actual morphology to
an external morphological analyzer that is not distributable; this module
instead encodes the standard, public Czech declension paradigms directly:

- masculine animate nouns: hard stems (*pán*: Novák → Nováka / Novákovi /
  Novákem), soft stems (*muž*: Tomáš → Tomáše / Tomáši / Tomášem), -a
  stems (*předseda*: Svoboda → Svobody / Svobodovi / Svobodou), fleeting
  -e- (-ek/-ec: Čapek → Čapka, Němec → Němce), mute final -e of foreign
  names (Garrigue → Garrigua / Garriguovi / Garriguem), soft-read -ge
  (*soudce*-like: George → George / Georgi / Georgem), adjectival
  surnames (-ý: Novotný → Novotného / Novotnému / Novotným), and the
  pronominal -y/-i declension of foreign given names (Harry → Harryho /
  Harrymu / Harrym);
- feminine: -a stems (*žena*: Anna → Anny / Anně / Annu / Annou, with the
  standard dative/locative consonant alternations k→c, g/h→z, ch→š, r→ř),
  -e/-ie stems (*růže*: Marie → Marii / Marií), adjectival -á and derived
  -ová surnames (Sychravová → Sychravové / Sychravovou), the ``-ová``
  derivation itself for consonant-final foreign surnames (O'Connor →
  O'Connorová / O'Connorové / O'Connorovou), and indeclinability of
  vowel-final foreign words (Flannery, Curie).

Emitted cases: genitive, dative, accusative, locative, instrumental (the
oblique cases a text mentions; the vocative is OPT-IN via
``czech_name_inflections(..., vocative=True)`` (r5) — it is rarely
written in transcripts and for hard stems collides with short datives,
so the namelist default leaves it off). Per-word alternative forms (e.g. dative
Janu/Janovi) are cross-producted exactly like the reference's
``/``-alternative contract; the non-final words keep both short and long
datives while the final (surname) slot uses the long ``-ovi`` form, which
is the combination actually written in Czech ("Janu Novákovi").

Name-internal prepositions (van, von, de …) and initials stay invariant
(namegen grammars type them t=7/t=A — non-inflecting terminals).

Validated in tests/test_czech_morph.py against the r2 hand-checked
fixture corpus as goldens (the generator REPRODUCES the corpus, it does
not consume it) plus hand-verified cases outside that corpus.
"""

from __future__ import annotations

from functools import lru_cache

from kglinker.data.wordlists import NAME_PREPOSITIONS

__all__ = ["decline_masc_word", "decline_fem_word", "decline_location_word",
           "czech_name_inflections", "czech_location_inflections",
           "guess_gender"]

CASES = ("gen", "dat", "acc", "loc", "instr")

_SOFT_FINALS = ("š", "č", "ř", "ž", "c", "j", "ď", "ť", "ň")
_VOWELS = "aeiouyáéěíóúůý"

# dictionary-listed SINGULAR -ice toponyms (r4): the productive -ice
# rule treats names as the majority PLURAL shape (Budějovice, Pardubice,
# Teplice); these frequent towns are grammatically singular feminine and
# would otherwise get plural oblique forms. Hand-verified; extend as the
# KB grows — unknown -ice names keep the plural default.
_SINGULAR_ICE = frozenset({
    "bystřice", "sušice", "roudnice", "kopřivnice", "březnice",
    "skalice", "lipnice", "telnice",
})

_CZ_DIACRITICS = "áčďéěíňóřšťúůýž"

# diacritic-free Czech toponyms the -ec / bare-c rules may decline (the
# emit-nothing contract for everything else: a foreign -ec/-c name like
# Quebec declines WITHOUT the fleeting e / feminine paradigm, so the
# productive rules must not touch it — r4 review fix)
_EC_TOWNS = frozenset({"liberec", "hradec", "jablonec", "kostelec"})
_C_TOWNS = frozenset({"olomouc"})


def _looks_czech(lw: str) -> bool:
    """Word carries a Czech-specific letter — the cheap signal that the
    productive Czech paradigms may apply to an unlisted name."""
    return any(c in _CZ_DIACRITICS for c in lw)

# feminine -a dative/locative stem-final alternations (žena paradigm)
_FEM_DAT_ALT = [
    ("ck", "cce"), ("sk", "sce"),            # Franceska → Francesce
    ("k", "ce"), ("ch", "še"), ("g", "ze"), ("h", "ze"), ("r", "ře"),
    ("d", "dě"), ("t", "tě"), ("n", "ně"),
    ("b", "bě"), ("p", "pě"), ("m", "mě"), ("v", "vě"), ("f", "fě"),
]


def _invariant(w: str) -> dict[str, list[str]]:
    return {c: [w] for c in CASES}


def decline_masc_word(w: str) -> dict[str, list[str]]:
    """Case → alternative forms for one word of a masculine person name."""
    lw = w.lower()
    # adjectival surname (Novotný, Veselý, -ský/-cký)
    if lw.endswith("ý"):
        s = w[:-1]
        return {"gen": [s + "ého"], "dat": [s + "ému"], "acc": [s + "ého"],
                "loc": [s + "ém"], "instr": [s + "ým"]}
    # -a stem (předseda: Svoboda, Smetana)
    if lw.endswith("a"):
        s = w[:-1]
        return {"gen": [s + "y"], "dat": [s + "ovi"], "acc": [s + "u"],
                "loc": [s + "ovi"], "instr": [s + "ou"]}
    # pronominal declension of foreign given names in [i] (Harry, Jimmy)
    if lw.endswith(("y", "i")) and len(lw) >= 3:
        return {"gen": [w + "ho"], "dat": [w + "mu"], "acc": [w + "ho"],
                "loc": [w + "m"], "instr": [w + "m"]}
    # soft adjectival -í (Jiří): Jiřího / Jiřímu / Jiřím
    if lw.endswith("í"):
        return {"gen": [w + "ho"], "dat": [w + "mu"], "acc": [w + "ho"],
                "loc": [w + "m"], "instr": [w + "m"]}
    # other vowel-final: indeclinable (Hugo, Janů)
    if lw[-1] in "ouúůóíéě":
        return _invariant(w)
    # mute final -e of French/English names: -gue/-que read as hard [g]/[k]
    if lw.endswith(("gue", "que")):
        s = w[:-1]
        return {"gen": [s + "a"], "dat": [s + "ovi"], "acc": [s + "a"],
                "loc": [s + "ovi"], "instr": [s + "em"]}
    # soft-read -ge/-je (George [-dž]): soudce-like, nominative = genitive
    if lw.endswith(("ge", "je")):
        s = w[:-1]
        return {"gen": [w], "dat": [s + "i", w + "ovi"], "acc": [w],
                "loc": [s + "i", w + "ovi"], "instr": [s + "em"]}
    # other mute -e (Pierre, Dave): drop the -e, hard paradigm
    if lw.endswith("e"):
        s = w[:-1]
        return {"gen": [s + "a"], "dat": [s + "ovi"], "acc": [s + "a"],
                "loc": [s + "ovi"], "instr": [s + "em"]}
    # fleeting -e-: -ek → -k- (Čapek → Čapka), -ec → -c- soft (Němec → Němce)
    if lw.endswith("ek") and len(lw) > 3:
        s = w[:-2] + w[-1]
        return {"gen": [s + "a"], "dat": [s + "u", s + "ovi"], "acc": [s + "a"],
                "loc": [s + "u", s + "ovi"], "instr": [s + "em"]}
    if lw.endswith("ec") and len(lw) > 3:
        s = w[:-2] + w[-1]
        return {"gen": [s + "e"], "dat": [s + "i", s + "ovi"], "acc": [s + "e"],
                "loc": [s + "i", s + "ovi"], "instr": [s + "em"]}
    # fleeting -e- in -el after a consonant (Karel → Karla, Havel → Havla;
    # vowel+el stays regular: Daniel → Daniela)
    if lw.endswith("el") and len(lw) > 3 and lw[-3] not in _VOWELS:
        s = w[:-2] + w[-1]
        return {"gen": [s + "a"], "dat": [s + "u", s + "ovi"], "acc": [s + "a"],
                "loc": [s + "u", s + "ovi"], "instr": [s + "em"]}
    # soft consonant final (muž: Tomáš, Lukáš, Ondřej)
    if lw.endswith(_SOFT_FINALS):
        return {"gen": [w + "e"], "dat": [w + "i", w + "ovi"], "acc": [w + "e"],
                "loc": [w + "i", w + "ovi"], "instr": [w + "em"]}
    # hard consonant final (pán: Jan, Novák, Washington, Beethoven)
    return {"gen": [w + "a"], "dat": [w + "u", w + "ovi"], "acc": [w + "a"],
            "loc": [w + "u", w + "ovi"], "instr": [w + "em"]}


def decline_fem_word(w: str, is_surname: bool) -> dict[str, list[str]]:
    """Case → alternative forms for one word of a feminine person name.
    ``is_surname`` gates the -ová derivation of consonant-final foreign
    surnames (given names never derive: Flannery stays Flannery)."""
    lw = w.lower()
    # derived/adjectival surnames and adjectival given forms: -ová / -á
    if lw.endswith("á"):
        s = w[:-1]
        return {"gen": [s + "é"], "dat": [s + "é"], "acc": [s + "ou"],
                "loc": [s + "é"], "instr": [s + "ou"]}
    # -ie / -e stems (růže: Marie, Lucie, Alice)
    if lw.endswith("e") and len(lw) >= 3:
        if is_surname:
            # vowel-final foreign surname (Curie): indeclinable, no -ová
            return _invariant(w)
        s = w[:-1]
        return {"gen": [w], "dat": [s + "i"], "acc": [s + "i"],
                "loc": [s + "i"], "instr": [s + "í"]}
    # -a stem (žena: Anna, Eva, Eliška) with dat/loc alternation
    if lw.endswith("a"):
        s = w[:-1]
        ls = lw[:-1]
        dat = None
        for suf, rep in _FEM_DAT_ALT:
            if ls.endswith(suf):
                dat = w[:-1 - len(suf)] + rep
                break
        if dat is None:
            dat = s + "e"   # soft finals and s/z/l take plain -e (Dáše, Denise)
        return {"gen": [s + "y"], "dat": [dat], "acc": [s + "u"],
                "loc": [dat], "instr": [s + "ou"]}
    # consonant-final: indeclinable; surnames additionally derive -ová
    if lw[-1] not in _VOWELS:
        out = _invariant(w)
        if is_surname:
            out = {
                "gen": [w, w + "ové"], "dat": [w, w + "ové"],
                "acc": [w, w + "ovou"], "loc": [w, w + "ové"],
                "instr": [w, w + "ovou"],
                # the derived nominative itself is a recognizable surface
                "nom_var": [w + "ová"],
            }
        return out
    # other vowel-final (Flannery, Niki): indeclinable
    return _invariant(w)


def decline_location_word(w: str) -> dict[str, list[str]] | None:
    """Case → alternatives for a single-word place name, or ``None`` when
    no paradigm is RECOGNIZED (the conservative contract: emit nothing
    rather than junk — the reference's namegen consults a morphological
    dictionary; we decline only the unambiguous public paradigms):

    - fem -a (Praha → Prahy / Praze / Prahu / Prahou, with the same
      dat/loc consonant alternations as feminine given names),
    - neuter -o (Brno → Brna / Brnu / Brně / Brnem),
    - plural -ice (Budějovice → Budějovic / Budějovicím / Budějovicích /
      Budějovicemi),
    - fem -ň (Plzeň → Plzně, fleeting -e-; Třeboň → Třeboně),
    - neuter -í (*stavení*, r4: Ústí / Veselí — all cases equal the
      nominative except instrumental +m: nad Ústím),
    - adjectival fem -á (r4: Hluboká → Hluboké / Hlubokou),
    - masc inanimate -ec with fleeting -e- (r4: Liberec → Liberce /
      Liberci / Libercem; Hradec → Hradce),
    - fem soft finals c/č/š/ž/ř (*píseň*-class, r4: Olomouc → Olomouce /
      Olomouci / Olomoucí; Třebíč → Třebíče; Kroměříž → Kroměříže),
    - fem i-stem ď/ť (*kost*-class, r5: Budapešť → Budapešti /
      Budapeští; Třešť → Třešti),
    - -j finals (r5: Hanoj → Hanoje / Hanoji; Dubaj → Dubaje — the
      gender-shared case subset, instrumental withheld),
    - hard-consonant masc inanimate (Tábor → Tábora/Táboru, v Táboře;
      Londýn → v Londýně; accusative = nominative).
    """
    lw = w.lower()
    if not any(c in _VOWELS for c in lw) or w.isupper():
        return None   # acronyms (TGM, USA) and vowel-less words stay put
    if lw in _SINGULAR_ICE:
        # dictionary-listed SINGULAR -ice toponyms (růže paradigm:
        # Bystřice → do Bystřice / v Bystřici / s Bystřicí) — the default
        # -ice rule below assumes the majority plural shape (Budějovice),
        # which is wrong for these; the reference resolves this with
        # namegen's morphological dictionary, we list the frequent ones
        s = w[:-1]
        return {"gen": [w], "dat": [s + "i"], "acc": [s + "i"],
                "loc": [s + "i"], "instr": [s + "í"]}
    if lw.endswith("ice") and len(lw) > 4:
        s = w[:-1]
        return {"gen": [w[:-1]], "dat": [s + "ím"], "acc": [w],
                "loc": [s + "ích"], "instr": [s + "emi"]}
    if lw.endswith("ia"):
        return None   # Latinate/English exonym (Czechia, Austria) — the
        # Czech text form is the -ie exonym below; don't fabricate -a forms
    if lw.endswith("ie") and len(lw) > 3:
        return decline_fem_word(w, is_surname=False)   # Anglie → Anglii
    if lw.endswith("a"):
        return decline_fem_word(w, is_surname=False)
    if lw.endswith("í"):
        # neuter *stavení* (Ústí, Veselí, Zámostí): indeclinable except
        # the instrumental (nad Ústím)
        return {"gen": [w], "dat": [w], "acc": [w],
                "loc": [w], "instr": [w + "m"]}
    if lw.endswith("á"):
        # adjectival feminine (Hluboká, Česká): same as the -á surname
        return decline_fem_word(w, is_surname=False)
    if lw.endswith("o"):
        s = w[:-1]
        ls = lw[:-1]
        alt = None
        for suf, rep in _FEM_DAT_ALT:
            if ls.endswith(suf):
                alt = w[:-1 - len(suf)] + rep
                break
        loc = [s + "u"] + ([alt] if alt else [])
        return {"gen": [s + "a"], "dat": [s + "u"], "acc": [w],
                "loc": loc, "instr": [s + "em"]}
    if lw.endswith("ň"):
        s = w[:-2] if lw[-2] == "e" else w[:-1]
        return {"gen": [s + "ně"], "dat": [s + "ni"], "acc": [w],
                "loc": [s + "ni"], "instr": [s + "ní"]}
    # feminine i-stem ď/ť finals (*kost*-class, r5 — the largest class
    # the r4 rules left conservative-None): Budapešť → Budapešti /
    # Budapeští, Třešť → Třešti (the -i genitive is the kost-class form;
    # Třešť also admits píseň-class Třeště — emitting the shared valid
    # subset, never junk). Orthography: ď/ť soften to d/t before i/í
    # (loď → lodi). ď/ť are Czech-specific letters, so no foreign-name
    # gate is needed.
    if lw.endswith(("ď", "ť")):
        s = w[:-1] + ("d" if lw[-1] == "ď" else "t")
        return {"gen": [s + "i"], "dat": [s + "i"], "acc": [w],
                "loc": [s + "i"], "instr": [s + "í"]}
    # -j finals (r5): gender-mixed — Hanoj is feminine (instr Hanojí),
    # Dubaj masculine inanimate (instr Dubajem) — but genitive -e,
    # dative/locative -i and accusative = nominative COINCIDE across
    # both paradigms, so emit that shared subset and keep the
    # instrumental at the nominative (i.e. emit nothing new for it)
    # rather than fabricate the wrong gender's form.
    if lw.endswith("j"):
        return {"gen": [w + "e"], "dat": [w + "i"], "acc": [w],
                "loc": [w + "i"], "instr": [w]}
    # masc inanimate -ec, fleeting -e- (Liberec → Liberce, v Liberci,
    # Libercem; Hradec, Jablonec, Žatec) — must precede the generic
    # soft-final rule ('c' is soft) because gender and instrumental
    # differ. Applies only to names that look Czech (diacritic) or are
    # dictionary-listed: a foreign -ec (Quebec) has no fleeting e
    if lw.endswith("ec") and len(lw) > 3:
        if not (_looks_czech(lw) or lw in _EC_TOWNS):
            return None   # conservative: emit nothing, not junk
        s = w[:-2] + w[-1]
        return {"gen": [s + "e"], "dat": [s + "i"], "acc": [w],
                "loc": [s + "i"], "instr": [s + "em"]}
    # feminine soft finals (*píseň*-class; r3-verdict #3 breadth):
    # Olomouc → Olomouce / Olomouci / Olomoucí, Třebíč, Kroměříž, Dobříš,
    # Jaroměř. Finals ď/ť/j are handled above (r5);
    # a plain-c final needs the Czech-look signal or the dictionary list
    # (Quebec/Chimac-style foreign names are masculine and decline
    # differently — emit nothing for them)
    if lw.endswith(("č", "š", "ž", "ř")) or (
            lw.endswith("c") and (_looks_czech(lw) or lw in _C_TOWNS)):
        return {"gen": [w + "e"], "dat": [w + "i"], "acc": [w],
                "loc": [w + "i"], "instr": [w + "í"]}
    if lw.endswith("c"):
        return None   # foreign bare-c final: conservative
    if lw[-1] not in _VOWELS and not lw.endswith(_SOFT_FINALS):
        alt = None
        for suf, rep in _FEM_DAT_ALT:
            if lw.endswith(suf):
                alt = w[:-len(suf)] + rep
                break
        loc = [w + "u"] + ([alt] if alt else [])
        return {"gen": [w + "u", w + "a"], "dat": [w + "u"], "acc": [w],
                "loc": loc, "instr": [w + "em"]}
    return None


def czech_location_inflections(name: str) -> list[str]:
    """Oblique-case forms of a place name (nominative excluded), sorted.
    Covers single-word names plus the "X nad/pod Y" river-toponym shape
    (r4: Ústí nad Labem, Kamýk nad Vltavou — decline X, keep the
    prepositional phrase invariant, the same analysis namegen's
    grammar_locations pass performs, create_cedar.sh:136-142). Other
    multi-word toponyms need a full grammar parse; emitting nothing
    remains the safe side of that trade."""
    return list(_location_cached(name))


@lru_cache(maxsize=8192)
def _location_cached(name: str) -> tuple[str, ...]:
    words = name.split(" ")
    # "X nad/pod Y [Z…]": the head declines, the preposition phrase is
    # already oblique (instrumental) and never changes form
    if len(words) >= 3 and words[1].lower() in ("nad", "pod"):
        d = decline_location_word(words[0])
        if d is None:
            return ()
        tail = " ".join(words[1:])
        out = {f"{f} {tail}" for alts in d.values() for f in alts}
        out.discard(name)
        return tuple(sorted(out))
    if len(words) != 1:
        return ()
    d = decline_location_word(words[0])
    if d is None:
        return ()
    out = {f for alts in d.values() for f in alts}
    out.discard(name)
    return tuple(sorted(out))


def vocative_masc_word(w: str) -> list[str]:
    """Masculine vocative singular of one name word (r5, opt-in — see
    :func:`czech_name_inflections`). Standard paradigm endings:
    hard stems -e with the k/h/g/ch → -u split (Jane!, Nováku!),
    r → ř after a consonant (Petře! but Viktore!), fleeting -ek → -ku
    (Čapku!), -ec → -če (Němče!), -el → -le (Karle!, Havle!), soft
    stems -i (Tomáši!), -a stems -o (Svobodo!), adjectival/-í/foreign
    -y/-i and vowel finals keep the nominative."""
    lw = w.lower()
    if lw.endswith(("ý", "í", "y", "i")) or lw[-1] in "ouúůóéě":
        return [w]
    if lw.endswith("a"):
        return [w[:-1] + "o"]
    if lw.endswith(("gue", "que", "ge", "je", "e")):
        return [w]                      # foreign mute/soft -e: unchanged
    if lw.endswith("ek") and len(lw) > 3:
        return [w[:-2] + "ku"]
    if lw.endswith("ec") and len(lw) > 3:
        return [w[:-2] + "če"]
    if lw.endswith("el") and len(lw) > 3 and lw[-3] not in _VOWELS:
        return [w[:-2] + "le"]
    if lw.endswith(_SOFT_FINALS):
        return [w + "i"]
    if lw.endswith(("k", "h", "g", "ch")):
        return [w + "u"]
    if lw.endswith("r") and len(lw) >= 2 and lw[-2] not in _VOWELS:
        return [w[:-1] + "ře"]
    return [w + "e"]


def vocative_fem_word(w: str) -> list[str]:
    """Feminine vocative singular: -a → -o (Evo!, Anno!); everything
    else (Marie, -ová/-á adjectival, consonant-final foreign) equals
    the nominative."""
    if w.lower().endswith("a") and not w.lower().endswith("á"):
        return [w[:-1] + "o"]
    return [w]


def guess_gender(name: str) -> str:
    """Heuristic for KB rows without a gender attribute (the reference's
    namegen guesses when the input omits the kind column, README.md of
    czechnames): derived/adjectival surname → F; -a/-ie first word → F;
    else M."""
    words = name.split(" ")
    if words and words[-1].lower().endswith(("ová", "á")):
        return "F"
    if words and words[0].lower().endswith(("a", "ie")):
        return "F"
    return "M"


def _declinable(w: str) -> bool:
    return (len(w) >= 2 and w[0].isalpha()
            and not w.endswith(".")
            and not w.isupper()                      # acronym aliases (TGM)
            and any(c in _VOWELS for c in w.lower())
            and w.lower() not in NAME_PREPOSITIONS)


def czech_name_inflections(name: str, gender: str = "",
                           vocative: bool = False) -> list[str]:
    """All oblique-case surface forms of a person name (the nominative
    itself excluded), sorted. Per-word alternatives are cross-producted
    within each case (the reference's ``/``-alternatives contract,
    ``KB2namelist.py:96-129``); the final declinable word of masculine
    dative/locative keeps only the long ``-ovi`` alternatives.

    ``vocative=True`` additionally emits the vocative ("Jane Nováku!" —
    reference namegen emits it via the grammar_* files,
    ``create_cedar.sh:136-142``). OPT-IN and off for the namelist
    default: transcripts rarely write it, and hard-stem vocatives
    collide with short datives, so the default keeps the r2-r4 surface
    set byte-stable."""
    return list(_inflections_cached(name, gender, vocative))


@lru_cache(maxsize=8192)   # also called per-turn by the corpus generator
def _inflections_cached(name: str, gender: str,
                        vocative: bool = False) -> tuple[str, ...]:
    words = name.split(" ")
    if not words or not any(_declinable(w) for w in words):
        return ()
    g = (gender or guess_gender(name)).upper()[:1]
    last_idx = max(i for i, w in enumerate(words) if _declinable(w))

    per_word: list[dict[str, list[str]]] = []
    for i, w in enumerate(words):
        if not _declinable(w):
            per_word.append(_invariant(w) | {"nom_var": [w]})
            continue
        if g == "F":
            d = decline_fem_word(w, is_surname=(i == last_idx))
            if vocative:
                d["voc"] = vocative_fem_word(w)
        else:
            d = decline_masc_word(w)
            if i == last_idx:
                for case in ("dat", "loc"):
                    long = [f for f in d[case] if f.endswith("ovi")]
                    if long:
                        d[case] = long
            if vocative:
                d["voc"] = vocative_masc_word(w)
        d.setdefault("nom_var", [w])
        per_word.append(d)

    out: set[str] = set()
    for case in CASES + (("voc",) if vocative else ()) + ("nom_var",):
        combos = [""]
        for d in per_word:
            alts = d.get(case) or [d["nom_var"][0]]
            combos = [c + (" " if c else "") + a for c in combos for a in alts]
        out.update(combos)
    out.discard(name)
    return tuple(sorted(out))
