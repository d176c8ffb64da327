"""Deterministic synthetic corpus of interleaved text+media documents.

Produces the authoritative input shape (BASELINE.json input_hint):

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

Each document interleaves 1-4 Turtle text spans with 0-3 media spans.
Text spans carry either one of the 42 golden fixtures verbatim or
generator-composed Turtle exercising the same grammar features (prefix
decls, ``;``/``,`` lists, blank-node lists, collections, multiline and
escaped literals, numeric literals).  Fully seeded — same (n_docs,
seed) always yields byte-identical documents regardless of partitioning
or core count, which is what makes the two-parallelism-level scaling
run an apples-to-apples comparison.

Generation itself is distributed (``spark.range`` + ``mapInPandas``):
at 10^12-document scale the corpus is *manufactured on executors*, not
collected through the driver.
"""

from __future__ import annotations

import json
import pathlib
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FIXTURES_PATH = (
    pathlib.Path(__file__).resolve().parent.parent.parent
    / "tests"
    / "fixtures"
    / "scan_fixtures.json"
)

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)

_PREFIX_POOL = [
    ("foaf", "http://xmlns.com/foaf/0.1/"),
    ("rel", "http://www.perceive.net/schemas/relationship/"),
    ("schema", "https://schema.org/"),
    ("dc", "http://purl.org/dc/terms/"),
    ("brick", "https://brickschema.org/schema/Brick#"),
    ("qudt", "http://qudt.org/schema/qudt/"),
    ("", "http://example.org/stuff/1.0/"),
]

_NAMES = [
    "Alice", "Bob", "Carol", "Dan", "Eve", "Frank", "Grace", "Heidi",
    "Iván", "Judy", "Mallory", "Niaj", "Olivia", "Peggy", "Человек-паук",
]
_WORDS = (
    "graph turtle parser stream shuffle partition entity mention link "
    "canonical subject predicate object literal prefix base collection "
    "blank node span media corpus executor broadcast salt skew"
).split()


def _load_fixture_cases() -> dict:
    """Load the golden fixture corpus; works from a source checkout and
    from inside a ``--py-files`` zip (driver side of spark-submit)."""
    try:
        with open(_FIXTURES_PATH) as f:
            return json.load(f)
    except OSError:
        # running from turtle_spark.zip: split the path at the archive
        parts = pathlib.Path(__file__).parts
        for i, part in enumerate(parts):
            if part.endswith(".zip"):
                import zipfile

                archive = pathlib.Path(*parts[: i + 1])
                with zipfile.ZipFile(archive) as z:
                    with z.open("tests/fixtures/scan_fixtures.json") as f:
                        return json.load(f)
        raise


def fixture_texts() -> list[str]:
    cases = _load_fixture_cases()
    return [cases[name]["turtle"] for name in sorted(cases)]


def _compose_literal(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.45:
        body = " ".join(rng.sample(_WORDS, rng.randint(1, 4)))
        lit = f'"{body}"'
        if rng.random() < 0.3:
            lit += "@" + rng.choice(["en", "cs", "ru", "de"])
        elif rng.random() < 0.3:
            lit += "^^xsd:string"
        return lit
    if roll < 0.6:  # numeric forms incl. exponent/sign
        return rng.choice(["1", "2.0", "3E1", "-2.3E-12", "42E3", "1e0", "false"])
    if roll < 0.75:  # multiline
        lines = [" ".join(rng.sample(_WORDS, 3)) for _ in range(2)]
        return '"""' + "\n".join(lines) + '"""'
    if roll < 0.9:  # escaped quote
        return '"escaped \\" quote ' + rng.choice(_WORDS) + '"'
    return f'"{rng.choice(_NAMES)}"'


def _compose_object(rng: random.Random, pfx: str) -> str:
    roll = rng.random()
    if roll < 0.5:
        return _compose_literal(rng)
    if roll < 0.75:
        return f"{pfx}:{rng.choice(_WORDS)}_{rng.randint(0, 99)}"
    if roll < 0.85:
        return f"[ {pfx}:note {_compose_literal(rng)} ]"
    if roll < 0.95:
        items = " ".join(_compose_literal(rng) for _ in range(rng.randint(1, 3)))
        return f"( {items} )"
    return f"<http://example.org/thing/{rng.randint(0, 9999)}>"


def compose_turtle(rng: random.Random, n_statements: int = 4) -> str:
    """One self-contained Turtle chunk from the reference grammar features."""
    tag, iri = rng.choice(_PREFIX_POOL)
    lines = [f"@prefix {tag}: <{iri}> ."]
    pfx = tag
    for i in range(n_statements):
        subj = f"{pfx}:{rng.choice(_WORDS)}{rng.randint(0, 999)}"
        n_preds = rng.randint(1, 3)
        preds = []
        for _ in range(n_preds):
            pred = rng.choice([f"{pfx}:{rng.choice(_WORDS)}", "a"])
            if pred == "a":
                objs = [f"{pfx}:{rng.choice(_WORDS).capitalize()}"]
            else:
                objs = [_compose_object(rng, pfx) for _ in range(rng.randint(1, 2))]
            preds.append(f"{pred} {', '.join(objs)}")
        lines.append(f"{subj} {' ; '.join(preds)} .")
    return "\n".join(lines)


def build_doc(doc_index: int, seed: int, fixtures: list[str]) -> tuple[str, list]:
    """Deterministically build one document's (doc_id, spans)."""
    rng = random.Random((seed << 20) ^ doc_index)
    doc_id = f"doc-{doc_index:09d}"
    n_text = rng.randint(1, 4)
    n_media = rng.randint(0, 3)
    spans = []
    for t in range(n_text):
        # ~1 in 8 text spans carries a golden fixture verbatim
        if rng.random() < 0.125:
            text = fixtures[rng.randrange(len(fixtures))]
        else:
            text = compose_turtle(rng, n_statements=rng.randint(2, 6))
        spans.append(("text", text, "", 0))
    for m in range(n_media):
        spans.append(("media", "", f"media://{doc_id}/{m}", 0))
    rng.shuffle(spans)
    spans = [
        (kind, text, ref, idx * 100 + rng.randint(0, 99))
        for idx, (kind, text, ref, _off) in enumerate(spans)
    ]  # strictly increasing offsets within the doc
    return doc_id, spans


def generate_docs(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: ``spark.range`` -> ``mapInPandas``."""
    import pandas as pd

    fixtures = fixture_texts()
    if partitions is None:
        # scale partition count with the corpus: ~64 docs per partition
        # floor so tiny corpora don't pay one Python-worker round trip
        # per 3 documents, capped at 2x parallelism for big ones (the
        # same docs-per-task reasoning as maxPartitionBytes at scale)
        partitions = max(
            1, min(spark.sparkContext.defaultParallelism * 2, n_docs // 64 + 1)
        )

    def gen(batches):
        for pdf in batches:
            rows = [build_doc(int(i), seed, fixtures) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "spans": [
                        [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for (k, t, m, o) in r[1]
                        ]
                        for r in rows
                    ],
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=DOCS_SCHEMA)
    )


def fixture_docs(spark: SparkSession) -> DataFrame:
    """The 42 golden fixtures as single-text-span documents.

    ``doc_id`` is the fixture name, so Spark-side extraction output can
    be compared per document against the golden triple arrays.
    """
    cases = _load_fixture_cases()
    rows = [
        (
            name,
            [{"kind": "text", "text": cases[name]["turtle"], "media_ref": "", "offset": 0}],
        )
        for name in sorted(cases)
    ]
    # 2 slices, not defaultParallelism: 42 one-row tasks cost more in
    # scheduling + Python round trips than the parse itself
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema=DOCS_SCHEMA
    )


def messy_text(i: int) -> str:
    """Deterministic unicode-damaged text #i — the synthetic input for
    the normalization operator (NFD sequences, zero-width/bidi junk,
    control chars, CRLF, whitespace runs), varied by i % 4."""
    base = (
        f"Doc {i}: cafe\u0301 nai\u0308ve re\u0301sume\u0301 "
        + "word " * (i % 5)
        + "end"
    )
    kind = i % 4
    if kind == 0:
        return base.replace(" ", " \u200b") + "\r\nsecond line"
    if kind == 1:
        return "\x07" + base.replace(" ", "  ") + "\x1b tail  "
    if kind == 2:
        return "\u202e" + base.replace(" ", "\t") + "\ufeff"
    return base


def generate_messy_docs(spark: SparkSession, n_docs: int = 40) -> DataFrame:
    rows = [(i, messy_text(i)) for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def broken_turtle(i: int) -> str:
    """Deterministic Turtle text #i with a structural defect chosen by
    i % 5 (0 = well-formed) — the synthetic input for the quarantine
    lint gate."""
    base = (
        f"@prefix ex: <http://ex.org/> .\n"
        f'ex:s{i} ex:p{i} "v{i}" .\n'
        f"ex:s{i} ex:q <http://ex.org/o{i}> ."
    )
    kind = i % 5
    if kind == 1:
        return base.rstrip(" .")          # dropped final dot
    if kind == 2:
        return base + f'\nzz{i}:bad ex:p "x" .'   # undeclared prefix
    if kind == 3:
        return base + '\nex:s ex:p [ ex:q "v" .'  # unclosed group
    if kind == 4:
        return base + '\nex:s ex:p "never closed'  # unclosed literal
    return base


def generate_broken_docs(spark: SparkSession, n_docs: int = 50) -> DataFrame:
    rows = [
        (
            f"bad-{i:06d}",
            [{"kind": "text", "text": broken_turtle(i), "media_ref": "", "offset": 0}],
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)
