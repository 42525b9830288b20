"""S2: HEAD-KB schema parser + TSV KB loader (SURVEY §2.1).

Port-of-semantics of ``/root/reference/metrics_knowledge_base.py:45-103``
(``getDictHeadKB``): a HEAD-KB file holds one tab-separated header line per
entity type; the first column is ``<type>{FLAGS[PREFIX]}NAME``, the rest
``{FLAGS[PREFIX]}NAME``. The parser yields per-type column layouts, the
per-column FLAGS/PREFIX metadata, and the (single, consistent) TYPE column
index — the reference raises when TYPE moves between types, and so do we.

The loader turns a heterogeneous HEAD-KB + TSV pair into ONE unified
DataFrame: the union of all per-type column names (normalized to
snake_case), each row's cells mapped through its own type's layout, with
stable 1-based ``kb_id`` = TSV line number
(``metrics_knowledge_base.py:191-197``). ``MULTIPLE VALUES`` flagged
columns keep the ``|`` delimiter (``KB_MULTIVALUE_DELIM``); wiki-metric
columns are cast to long so the result feeds :func:`kglinker.kb.scoring.
score_kb` / :func:`kglinker.kb.names.build_namelist` directly.

Scale: the KB is the engine's small side; the TSV is parsed with a
DataFrame line-read + split (JVM-side), the line number via
``zipWithIndex`` on a single-pass RDD (deterministic file order).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["HeadKB", "parse_head_kb", "load_kb_tsv", "load_kb_head_all",
           "ensure_kb_columns", "normalize_col"]

# columns the engine's KB-side operators expect (kb_fixture.KB_COLUMNS
# minus the wiki metric columns, which load as longs)
ENGINE_KB_COLUMNS = [
    "type", "name", "disambiguation_name", "aliases", "redirects",
    "description", "gender", "date_of_birth", "date_of_death", "jobs",
    "nationality", "location", "country", "source_loc", "founded",
    "cancelled", "start", "end", "wiki_url",
]


def ensure_kb_columns(kb: DataFrame) -> DataFrame:
    """Pad a HEAD-KB-loaded frame with any engine columns its snapshot's
    types did not define (empty string; wiki metrics null long) so it can
    drive score_kb / build_namelist / canonical_map directly."""
    for c in ENGINE_KB_COLUMNS:
        if c not in kb.columns:
            kb = kb.withColumn(c, F.lit(""))
    for c in ("wiki_backlinks", "wiki_hits", "wiki_ps"):
        if c not in kb.columns:
            kb = kb.withColumn(c, F.lit(None).cast("long"))
    return kb

_PARSER_FIRST = re.compile(r"""(?ux)
    ^
    <(?P<TYPE>[^>]+)>
    (?:\{(?P<FLAGS>(?:\w|[ ])*)(?:\[(?P<PREFIX>[^\]]+)\])?\})?
    (?P<NAME>(?:\w|[ ])+)
    $
""")
_PARSER_OTHER = re.compile(r"""(?ux)
    ^
    (?:\{(?P<FLAGS>(?:\w|[ ])*)(?:\[(?P<PREFIX>[^\]]+)\])?\})?
    (?P<NAME>(?:\w|[ ])+)
    $
""")


@dataclass(frozen=True)
class HeadCol:
    name: str           # raw HEAD-KB column name, e.g. "DATE OF BIRTH"
    index: int          # 0-based column position within the type's row
    flags: tuple[str, ...]
    prefix: str


@dataclass
class HeadKB:
    types: dict[str, list[HeadCol]]   # type → ordered column layout
    type_col: int                     # the (consistent) TYPE column index

    def arity(self, etype: str) -> int:
        return len(self.types[etype])

    def unified_columns(self) -> list[str]:
        """Normalized union of all column names, first-appearance order."""
        out: list[str] = []
        for cols in self.types.values():
            for c in cols:
                n = normalize_col(c.name)
                if n not in out:
                    out.append(n)
        return out

    def multi_valued(self) -> set[str]:
        return {normalize_col(c.name) for cols in self.types.values()
                for c in cols if "MULTIPLE VALUES" in " ".join(c.flags)}


def normalize_col(name: str) -> str:
    return name.strip().lower().replace(" ", "_")


def parse_head_kb(text: str) -> HeadKB:
    """HEAD-KB text → per-type layouts + TYPE column index
    (getDictHeadKB, metrics_knowledge_base.py:45-103)."""
    types: dict[str, list[HeadCol]] = {}
    type_col: int | None = None
    for line in text.splitlines():
        if not line:
            continue
        cells = line.split("\t")
        m0 = _PARSER_FIRST.search(cells[0])
        if m0 is None:
            raise ValueError(f"bad HEAD-KB first column: {cells[0]!r}")
        etype = m0.group("TYPE")
        if etype in types:
            raise ValueError(f"duplicate HEAD-KB type {etype!r}")
        cols: list[HeadCol] = []
        seen: set[str] = set()
        for i, cell in enumerate(cells):
            m = m0 if i == 0 else _PARSER_OTHER.search(cell)
            if m is None:
                raise ValueError(f"bad HEAD-KB column {cell!r} in {etype!r}")
            name = m.group("NAME")
            if name in seen:   # reference RuntimeError on duplicates
                raise ValueError(f"column {name!r} repeated for {etype!r}")
            seen.add(name)
            flags = tuple(f for f in (m.group("FLAGS") or "").split() if f)
            cols.append(HeadCol(name, i, flags, m.group("PREFIX") or ""))
            if name == "TYPE":
                if type_col is None:
                    type_col = i
                elif type_col != i:
                    # reference: TYPE must sit at the same index everywhere
                    raise ValueError("TYPE column index differs between types")
        types[etype] = cols
    if type_col is None:
        raise ValueError("HEAD-KB defines no TYPE column")
    return HeadKB(types, type_col)


_WIKI_LONG = {"wiki_backlinks", "wiki_hits", "wiki_ps"}


def load_kb_head_all(spark: SparkSession, path: str,
                     strict: bool = True) -> tuple[str, DataFrame]:
    """Load the combined ``KB-HEAD.all`` snapshot the reference ships to
    its shm daemon (``prepare_data.sh``: ``VERSION=<v>`` line + HEAD-KB
    lines + KB TSV body). Returns ``(version, kb_df)``; the version string
    is the KB snapshot id the lineage layer records."""
    lines = spark.sparkContext.textFile(path)
    header = lines.take(200)
    if not header or not header[0].startswith("VERSION="):
        raise ValueError("KB-HEAD.all must start with a VERSION= line")
    version = header[0][len("VERSION="):].strip()
    head_lines = []
    for ln in header[1:]:
        if ln.startswith("<"):
            head_lines.append(ln)
        else:
            break
    if not head_lines:
        raise ValueError("no HEAD-KB lines after VERSION=")
    kb = load_kb_tsv(spark, "\n".join(head_lines), path, strict=strict,
                     skip_lines=1 + len(head_lines))
    return version, kb


def load_kb_tsv(spark: SparkSession, head_text: str, tsv_path: str,
                strict: bool = True, skip_lines: int = 0) -> DataFrame:
    """HEAD-KB + TSV → unified KB DataFrame with 1-based ``kb_id``.

    Rows whose type is unknown or whose cell count differs from the
    type's HEAD-KB arity are rejected (``strict=True`` raises, matching
    check_columns_in_kb.py:42-53; ``strict=False`` drops them).
    ``skip_lines`` skips a leading header block (KB-HEAD.all)."""
    head = parse_head_kb(head_text)
    unified = head.unified_columns()
    # per-type mapping: unified column name → source index (or None)
    mapping = {
        etype: {normalize_col(c.name): c.index for c in cols}
        for etype, cols in head.types.items()}
    arities = {etype: len(cols) for etype, cols in head.types.items()}
    type_col = head.type_col

    lines = spark.sparkContext.textFile(tsv_path)

    def to_row(pair):
        line, idx = pair
        cells = line.rstrip("\n").split("\t")
        etype_full = cells[type_col] if type_col < len(cells) else ""
        etype = etype_full.split(":")[0]
        kb_id = int(idx) + 1 - skip_lines
        if etype not in mapping or len(cells) != arities[etype]:
            return (kb_id, None, cells)   # arity violation
        colmap = mapping[etype]
        vals = [cells[colmap[u]] if u in colmap else "" for u in unified]
        return (kb_id, vals, None)

    parsed = (lines.zipWithIndex()
              .filter(lambda p: p[1] >= skip_lines)
              .map(to_row))
    bad = parsed.filter(lambda r: r[1] is None)
    if strict:
        offending = bad.take(1)
        if offending:
            raise ValueError(
                f"KB row {offending[0][0]} violates HEAD-KB arity/type: "
                f"{offending[0][2][:3]}...")
    rows = parsed.filter(lambda r: r[1] is not None) \
                 .map(lambda r: tuple([r[0]] + r[1]))
    schema = "kb_id long, " + ", ".join(f"`{c}` string" for c in unified)
    df = spark.createDataFrame(rows, schema)
    for c in _WIKI_LONG & set(unified):
        df = df.withColumn(
            c, F.when(F.col(c) == "", None).otherwise(F.col(c)).cast("long"))
    return df
