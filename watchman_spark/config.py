"""Pipeline configuration: grok pattern registry and run settings.

Patterns are data (config-driven), schemas are computed from patterns at
session start — not inferred from rows (SURVEY.md §1.3). One grok pattern is
a regex with named capture groups; the union of all groups (declaration
order, first-pattern-wins on name collision) defines the ``parsed`` struct.

Provenance: BASELINE.json:6 ("grok-style regex extraction to the text
column — tool invocations, error codes, latency markers").
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

_NAMED_GROUP = re.compile(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>")


@dataclass(frozen=True)
class GrokPattern:
    """One named extraction pattern.

    ``regex`` uses Python named-group syntax ``(?P<name>...)``; the JVM path
    converts to Java syntax ``(?<name>...)`` automatically. ``types`` maps
    group name -> "int" | "string" (default string).

    ``prefilter`` is an optional literal substring that every matching line
    must contain — a cheap non-regex gate applied before the regex (both
    engines). On a log-typical mix most lines match no pattern, so the
    prefilter skips the expensive extraction for the majority of rows.
    Correctness is unaffected: rows failing the prefilter cannot match the
    regex (the literal is a substring of the pattern).
    """

    name: str
    regex: str
    types: dict[str, str] = field(default_factory=dict)
    prefilter: str | None = None

    @property
    def groups(self) -> list[str]:
        return _NAMED_GROUP.findall(self.regex)

    @property
    def java_regex(self) -> str:
        # Java named groups forbid '_' in names; the JVM path extracts by
        # group index, so plain unnamed groups are the portable form.
        return _NAMED_GROUP.sub("(", self.regex)

    def compiled(self) -> re.Pattern:
        # re.ASCII pins \d/\w/\s to ASCII — Java regex's DEFAULT semantics —
        # so the pandas and jvm engines can never disagree on Unicode
        # digits/word chars (found by hypothesis: '٠' ARABIC-INDIC
        # ZERO matched Python \d but not Java \d, so one engine routed the
        # line and the other did not; tests/test_props.py
        # ::test_engines_agree_on_arbitrary_text)
        return re.compile(self.regex, re.ASCII)


# Default registry (FIXTURES.md §1 "Grok patterns"). ERROR's message group is
# non-greedy so the trailing latency marker parses.
DEFAULT_PATTERNS: tuple[GrokPattern, ...] = (
    GrokPattern(
        name="TOOL_CALL",
        regex=(
            r"\[tool:(?P<tool_name>[a-z_]+)\] invoked"
            r" args=(?P<args_n>\d+) latency_ms=(?P<latency_ms>\d+)"
            r" status=(?P<status>ok|err)"
        ),
        types={"args_n": "int", "latency_ms": "int"},
    ),
    GrokPattern(
        name="ERROR",
        regex=r"ERROR (?P<error_code>E\d{3}): (?P<error_msg>.+?) after (?P<err_ms>\d+)ms",
        types={"err_ms": "int"},
    ),
)
# Prefilters are deliberately OFF for the default registry, and the A/B is
# now measured at BOTH densities (BENCH/PREFILTER.md, 10M rows, both
# engines, median of interleaved cycles): no reliable win anywhere —
# ~40% match is noise-level on both engines (0.99-1.01x), and at the ~2%
# log-typical sparse mix the jvm engine skews slightly NEGATIVE (~0.92x)
# while pandas is neutral-to-slightly-positive (1.03-1.15x across runs,
# within host drift). Reason: these regexes are anchored on literals
# ("[tool:", "ERROR E"), so a failed regex search is already one linear
# scan with a literal-prefix fast path in both engines; the contains()
# gate re-scans the same bytes. Reach for prefilter="..." only when a
# pattern's failure path is super-linear (backtracking-prone, no literal
# anchor) — and re-measure with `python bench.py --prefilter-ab`.

# Output routing is DATA too (BASELINE.json:6 "mirroring watchman's
# configurable output routing"): an ordered list of (sink_name, SQL
# boolean condition) rules, first match wins, plus a catch-all default
# sink. The default mirrors the spec's three sinks. Conditions are Spark
# SQL expressions over the parsed/enriched row (the ``parsed`` struct is
# in scope). Routing stays TOTAL by construction: the default sink
# catches everything no rule matched.
DEFAULT_ROUTES: tuple[tuple[str, str], ...] = (
    ("errors", "parsed.error_code IS NOT NULL"),
    ("tool_calls", "parsed.tool_name IS NOT NULL"),
)
DEFAULT_SINK = "conversational"

_SINK_NAME = re.compile(r"^[a-z][a-z0-9_]*$")


def validate_routes(routes: tuple[tuple[str, str], ...], default_sink: str) -> None:
    names = [r[0] for r in routes] + [default_sink]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate sink names in routes: {names}")
    for n in names:
        if not _SINK_NAME.match(n):
            raise ValueError(f"invalid sink name {n!r} (want [a-z][a-z0-9_]*)")


def patterns_from_json(path: str) -> tuple[GrokPattern, ...]:
    """Load a pattern registry from a JSON config file (SURVEY.md §3.1
    step 1: patterns are DATA — an operator adds one by editing config, not
    code). File shape:

        {"patterns": [{"name": "...", "regex": "...",
                       "types": {"group": "int"}, "prefilter": "..."}]}

    Each regex is validated (compiled, and must declare at least one named
    group) at LOAD time, so a bad registry fails the job at startup, not
    mid-run on the executors. The ``parsed`` struct schema is computed from
    the loaded registry exactly as for the code-default one."""
    import json as _json

    with open(path) as f:
        data = _json.load(f)
    if "patterns" not in data:
        raise ValueError(f"config {path!r} has no 'patterns' section")
    return _parse_patterns(data, path)


def _parse_patterns(data: dict, path: str) -> tuple[GrokPattern, ...]:
    pats = []
    for p in data["patterns"]:
        pat = GrokPattern(
            name=p["name"],
            regex=p["regex"],
            types=dict(p.get("types", {})),
            prefilter=p.get("prefilter"),
        )
        pat.compiled()  # validate regex now
        if not pat.groups:
            raise ValueError(f"pattern {pat.name!r} declares no named capture groups")
        for g, typ in pat.types.items():
            if typ not in ("int", "string"):
                raise ValueError(f"pattern {pat.name!r}: unsupported type {typ!r} for group {g!r}")
        pats.append(pat)
    if not pats:
        raise ValueError(f"pattern registry {path!r} is empty")
    return tuple(pats)


def routes_from_json(path: str) -> tuple[tuple[tuple[str, str], ...], str] | None:
    """Optional routing section of the same JSON config file:

        {"routes": [{"sink": "errors", "when": "parsed.error_code IS NOT NULL"},
                    ...],
         "default_sink": "conversational"}

    Returns (routes, default_sink), or None when the file has no "routes"
    key (callers then keep DEFAULT_ROUTES). Sink names and rule shape are
    validated at load time; each "when" SQL condition is parsed (and its
    columns resolved) when the routing CASE chain is analyzed at plan-setup
    — still BEFORE any read or write runs (Spark analyzes withColumn
    eagerly), so a bad condition fails the job at startup."""
    import json as _json

    with open(path) as f:
        data = _json.load(f)
    return _parse_routes(data)


def _parse_routes(data: dict) -> tuple[tuple[tuple[str, str], ...], str] | None:
    if "routes" not in data:
        return None
    routes = []
    for r in data["routes"]:
        if "sink" not in r or "when" not in r:
            raise ValueError(f"route rule needs 'sink' and 'when': {r!r}")
        if not isinstance(r["when"], str) or not r["when"].strip():
            raise ValueError(f"route {r['sink']!r}: 'when' must be a non-empty SQL string")
        routes.append((r["sink"], r["when"]))
    routes = tuple(routes)
    default_sink = data.get("default_sink", DEFAULT_SINK)
    validate_routes(routes, default_sink)
    return routes, default_sink


def load_config(
    path: str,
) -> tuple[tuple[GrokPattern, ...], tuple[tuple[str, str], ...], str]:
    """One-read loader for the full JSON config: (patterns, routes,
    default_sink), each section optional and independently defaulted —
    a routes-only file keeps the built-in pattern registry and vice
    versa."""
    import json as _json

    with open(path) as f:
        data = _json.load(f)
    patterns = _parse_patterns(data, path) if "patterns" in data else DEFAULT_PATTERNS
    routing = _parse_routes(data) or (DEFAULT_ROUTES, DEFAULT_SINK)
    return patterns, routing[0], routing[1]


def patterns_to_json(patterns: tuple[GrokPattern, ...]) -> str:
    """Serialize a registry to the JSON config shape (round-trip with
    patterns_from_json — tested in tests/test_parse.py)."""
    import json as _json

    return _json.dumps(
        {
            "patterns": [
                {
                    "name": p.name,
                    "regex": p.regex,
                    "types": p.types,
                    **({"prefilter": p.prefilter} if p.prefilter else {}),
                }
                for p in patterns
            ]
        },
        indent=1,
    )


def parsed_struct(patterns: tuple[GrokPattern, ...] = DEFAULT_PATTERNS) -> StructType:
    """Compute the ``parsed`` struct schema from a pattern registry."""
    fields: list[StructField] = []
    seen: set[str] = set()
    for pat in patterns:
        for g in pat.groups:
            if g in seen:
                continue
            seen.add(g)
            typ = IntegerType() if pat.types.get(g) == "int" else StringType()
            fields.append(StructField(g, typ, True))
    return StructType(fields)


@dataclass(frozen=True)
class PipelineConfig:
    """Frozen run configuration for the batch pipeline (SURVEY.md §3.1)."""

    warehouse: str  # root dir of the parquet-warehouse backend
    input_table: str = "transcripts"
    patterns: tuple[GrokPattern, ...] = DEFAULT_PATTERNS
    # ordered (sink, SQL condition) rules, first match wins; every row the
    # rules miss lands in default_sink (total routing by construction)
    routes: tuple[tuple[str, str], ...] = DEFAULT_ROUTES
    default_sink: str = DEFAULT_SINK
    n_buckets: int = 32  # conv_id hash buckets = checkpoint/work unit
    # "pandas" (Arrow iterator UDF, one C-level str.extract per pattern)
    # | "jvm" (rlike + regexp_extract; zero Python boundary). Round-6
    # re-measure at 9.4M turns, 32 cores, with the post-shuffle stage
    # isolated (noop sink): jvm 4.0s vs pandas 8.3s for the identical
    # parse→enrich→route projection — at full core counts the 32 Arrow
    # Python workers double the process pressure on one box, and the
    # r6 shuffle/sort fixes shrank everything AROUND the parse, so the
    # engines are no longer within drift (round 3 measured them even
    # because the write stage dominated). Default is now jvm for the
    # small default registry (2 patterns / 7 groups). The trade-off is
    # unchanged and documented: the JVM path re-executes the regex once
    # per capture group, so for production registries with tens of
    # patterns/groups choose engine="pandas" (one C-level extract pass
    # per pattern regardless of group count) — it is one config key.
    parse_engine: str = "jvm"
    run_id: str = "run-0"
    # cap buckets per run (None = all pending): bounds a run's blast radius
    # at 10^12 scale and lets operators drip through the backlog
    max_buckets_per_run: int | None = None

    @property
    def sink_names(self) -> tuple[str, ...]:
        return tuple(r[0] for r in self.routes) + (self.default_sink,)

    def __post_init__(self) -> None:
        validate_routes(self.routes, self.default_sink)
