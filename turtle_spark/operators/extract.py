"""Stage B — triple extraction: docs(doc_id, spans) -> triples.

The Turtle parser (turtle_spark.core) runs *inside* ``mapInPandas``:
one Arrow batch of documents per Python call, a plain Python loop over
the documents inside the batch — per-batch Python overhead, never
per-row (the reference's per-``Unmarshal``-call scanner state maps to
per-document parser state, so parallelism cannot perturb blank-node
numbering; SURVEY.md §4.2).

Scale properties:

* narrow-only transformation — zero shuffles; parallelism equals input
  partitioning, so 1000 executors extract 1000 partitions at once;
* column pruning reaches the scan: only ``doc_id`` and ``spans`` are
  read no matter how wide the docs table is;
* media spans never enter Python — ``media_triples`` is a pure
  DataFrame explode/filter, fully JVM-side with whole-stage codegen;
* ``subject_hash`` is computed JVM-side with ``xxhash64`` for the
  bucketed materialization (stage E).

Reference parity: emitted rows match nvkp/turtle's annotated triples
(scanner/scanner.go:324-329); ``seq`` is the per-document emission
index for ordered golden comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from turtle_spark.core.parser import parse_document

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("subject", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("datatype", T.StringType()),
        T.StructField("objecttype", T.StringType()),
    ]
)

DOC_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("base", T.StringType()),
        T.StructField("prefixes", T.MapType(T.StringType(), T.StringType())),
        T.StructField("n_triples", T.LongType()),
        T.StructField("n_text_spans", T.IntegerType()),
        T.StructField("n_media_spans", T.IntegerType()),
    ]
)

DOC_NS = "http://turtle-spark.dev/ns#"
HAS_MEDIA = DOC_NS + "hasMedia"
DOC_IRI_PREFIX = "http://turtle-spark.dev/doc/"


def assemble_text(spans) -> str:
    """Concatenate text spans in offset order.

    The per-row invariant (span-sequence equality) is preserved because
    assembly only *reads* spans; documents flow through extraction
    untouched.
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    return "\n".join(s["text"] for s in ordered if s["kind"] == "text")


def extract_triples(docs: DataFrame, base: str = "", prefixes: dict[str, str] | None = None) -> DataFrame:
    """Parse every document's text spans into annotated triples.

    ``base``/``prefixes`` pre-seed the parse context for the whole
    corpus (the reference's Config semantics); document directives
    override them per document.
    """
    import pandas as pd

    seed_prefixes = dict(prefixes) if prefixes else {}

    def parse_batches(batches):
        for pdf in batches:
            doc_ids: list[str] = []
            seqs: list[int] = []
            cols: list[list[str]] = [[], [], [], [], [], []]
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                text = assemble_text(spans)
                result = parse_document(text, base=base, prefixes=seed_prefixes)
                for i, t in enumerate(result.triples):
                    doc_ids.append(doc_id)
                    seqs.append(i)
                    for c in range(6):
                        cols[c].append(t[c])
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "seq": pd.Series(seqs, dtype="int64"),
                    "subject": cols[0],
                    "predicate": cols[1],
                    "object": cols[2],
                    "label": cols[3],
                    "datatype": cols[4],
                    "objecttype": cols[5],
                }
            )

    return docs.select("doc_id", "spans").mapInPandas(parse_batches, schema=TRIPLES_SCHEMA)


def extract_doc_metadata(docs: DataFrame, base: str = "", prefixes: dict[str, str] | None = None) -> DataFrame:
    """Per-document parse metadata: accumulated base, prefixes, counts."""
    import pandas as pd

    seed_prefixes = dict(prefixes) if prefixes else {}

    def meta_batches(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "base", "prefixes", "n_triples", "n_text_spans", "n_media_spans")}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                result = parse_document(assemble_text(spans), base=base, prefixes=seed_prefixes)
                out["doc_id"].append(doc_id)
                out["base"].append(result.base)
                out["prefixes"].append(result.prefixes)
                out["n_triples"].append(len(result.triples))
                out["n_text_spans"].append(sum(1 for s in spans if s["kind"] == "text"))
                out["n_media_spans"].append(sum(1 for s in spans if s["kind"] == "media"))
            pdf_out = pd.DataFrame(out)
            pdf_out["n_triples"] = pdf_out["n_triples"].astype("int64")
            pdf_out["n_text_spans"] = pdf_out["n_text_spans"].astype("int32")
            pdf_out["n_media_spans"] = pdf_out["n_media_spans"].astype("int32")
            yield pdf_out

    return docs.select("doc_id", "spans").mapInPandas(meta_batches, schema=DOC_META_SCHEMA)


def media_triples(docs: DataFrame) -> DataFrame:
    """doc -> hasMedia -> media_ref triples. Pure JVM-side explode.

    No Python boundary: whole-stage codegen end to end, and the span
    struct fields are pruned at the scan.
    """
    span = F.explode("spans").alias("span")
    return (
        docs.select("doc_id", span)
        .where(F.col("span.kind") == "media")
        .select(
            F.col("doc_id"),
            F.lit(-1).cast("long").alias("seq"),
            F.concat(F.lit(DOC_IRI_PREFIX), F.col("doc_id")).alias("subject"),
            F.lit(HAS_MEDIA).alias("predicate"),
            F.col("span.media_ref").alias("object"),
            F.lit("").alias("label"),
            F.lit("").alias("datatype"),
            F.lit("iri").alias("objecttype"),
        )
    )


def with_subject_hash(triples: DataFrame) -> DataFrame:
    """Add the 64-bit subject hash used for bucketed materialization."""
    return triples.withColumn("subject_hash", F.xxhash64("subject"))
