"""The distributed extraction pipeline (SURVEY §3.1 rebuild trace).

Logical plan::

    scan(parquet documents)                         # driver table
      → mapInPandas(build_corpus)                   # F1 rows (url, ts, html, text, lang)
      → where(NOT url endswith _ocr.pdf/_test.pdf)  # S3 source filter, JVM-side
      ├─ light docs (payload ≤ threshold):
      │    mapInPandas(extract_doc)                 # whole doc in one task, NO shuffle
      └─ heavy docs (payload > threshold):          # the skew tail
           mapInPandas(explode_pages)               # doc → per-page rows
           → repartition(K, xxhash64(url, page_no)) # salt: spread one doc's pages
           → mapInPandas(extract_page)              # per-page OCR+parse+norm+route-match
           → groupBy(url).agg(...)                  # JVM reassembly: collect_list
                                                    #   + array_sort + array_join +
                                                    #   ordered route reduction
      → unionByName

Why this shape at 100 TB:

* The S3 filter and the light/heavy split are Catalyst expressions
  (``endswith``, ``length(html)``) — pushed/pruned JVM-side, no Python.
* 99% of documents never shuffle: one Arrow round-trip, map-only.
* The 1% multi-hundred-page tail — which would otherwise pin a task per
  AQE's inability to split a single row — is exploded to page granularity
  *before* the expensive stage and hash-spread across the cluster
  (SURVEY §4: salt *pages*, AQE can't split a row).
* The reassembly shuffle only carries (url, page_no, page_text) — the
  extracted strings, not the raster payloads.
* All Python work is Arrow-batched ``mapInPandas``; per-batch failure
  capture keeps data errors out of task retries
  (graceful degradation, ref: pypdfocr/pypdfocr_pdf.py:276-281).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import corpus as ck
from .config import ExtractConfig
from .kernels import codec, hocr, htmlx
from .kernels.normalize import normalize_page_text
from .kernels.route import first_matching_folder, route_document
from .schema import (
    CORPUS_SCHEMA,
    EXTRACTED_SCHEMA,
    PAGE_SCHEMA,
    PAGE_TEXT_SCHEMA,
)

EXCLUDED_SUFFIXES = ck.EXCLUDED_SUFFIXES


# --------------------------------------------------------------- corpus build
def build_corpus_df(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Derive the F1 Common-Crawl-style corpus from the driver's
    ``documents`` parquet — deterministic per doc_id (corpus.py rules),
    built executor-side in Arrow batches.

    ``replicate`` > 1 deterministically replicates the seed rows with
    disjoint doc_id ranges (offset 10^7 per copy) — used to build a
    corpus large enough that compute dominates scheduling overhead in the
    scaling-efficiency measurement (BASELINE.md protocol)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, t, l, s in zip(pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]):
                r = ck.build_corpus_row(int(d), t, l, s)
                r["n_bytes"] = len(r["html"])
                rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in CORPUS_SCHEMA.fields])

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    if replicate > 1:
        copies = spark.range(replicate).select((F.col("id") * 10_000_000).alias("doc_offset"))
        docs = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("doc_offset")).alias("doc_id"), "text", "lang", "source"
        )
    # The driver parquet is a single small file → a single input split →
    # every downstream Python stage would serialize onto one task. Spread
    # the (tiny) seed rows across the cluster before the payload-building
    # stage, unconditionally: this path only ever derives a corpus from
    # the small seed table (at 100 TB the pipeline scans the real corpus
    # table and never runs this), so the repartition is always warranted
    # and costs one shuffle of the seed rows — no RDD-conversion job to
    # probe the current partitioning.
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.mapInPandas(gen, CORPUS_SCHEMA)


# ----------------------------------------------------------- light-path UDFs
def _doc_kernel(payload: bytes, cfg: ExtractConfig):
    """Strategy dispatch per document: real %PDF payloads go to the
    subprocess-backed gs+tesseract kernel when the (driver-resolved)
    strategy selects it; everything else uses the builtin codec."""
    if cfg.ocr_strategy == "subprocess" and payload.startswith(b"%PDF"):
        from .kernels import subproc

        return subproc.extract_doc_subprocess(
            payload, gs_binary=cfg.gs_binary,
            tesseract_binary=cfg.tesseract_binary,
            preprocess=cfg.preprocess, convert_binary=cfg.convert_binary,
            pdfimages_binary=cfg.pdfimages_binary,
            identify_binary=cfg.identify_binary,
        )
    return ck.extract_doc(payload)


def _extract_rows(pdf: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    t0 = time.monotonic()
    out = []
    for url, ts, payload, lang in zip(pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]):
        payload = bytes(payload)
        try:
            pages, status = _doc_kernel(payload, cfg)
            text, n_pages = "\n".join(pages), len(pages)
            norm_pages = [normalize_page_text(p) for p in pages]
            route = route_document(
                norm_pages, url, cfg.targets,
                use_filename=cfg.use_filename, default=cfg.default_route,
            )
        except Exception as exc:  # data error → row, never task failure
            text, n_pages, status, route = "", 0, f"error:{type(exc).__name__}", cfg.default_route
        # doc norm = per-page norms joined by space — equal to
        # normalize_page_text(text) because ascii-ignore distributes over
        # concat and the joining '\n' itself normalizes to ' ' (the same
        # S6 identity _jvm_reassemble relies on); avoids re-normalizing
        # the whole document text a second time (r6)
        out.append(
            (url, ts, lang, text, " ".join(norm_pages), route, n_pages, status, len(payload))
        )
    # per-row share of this batch's Python compute → lineage wall_ms
    share = (time.monotonic() - t0) * 1000.0 / max(len(out), 1)
    res = pd.DataFrame(out, columns=[f.name for f in EXTRACTED_SCHEMA.fields][:-1])
    res["wall_ms"] = share
    return res


# ----------------------------------------------------------- heavy-path UDFs
def _explode_rows(pdf: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """Split a heavy document into per-page rows — a cheap splitter only
    (decode + per-page re-encode). The expensive work (rasterize at the
    output dpi, hOCR, parse) happens downstream in the salted per-page
    stage; doing it here would pin one task per multi-hundred-page doc,
    exactly the skew the explode exists to break.

    Payload dispatch mirrors the light path's ``corpus.extract_doc``
    exactly: SYNPDF → page rows; HTML head → one raw pseudo-page; empty
    SYNPDF body → an n_pages=0 carrier row; anything else → an
    'unsupported' carrier row (n_pages=0), so the per-page stage can
    stamp the same statuses the light path would."""
    out = []
    for url, ts, payload, lang in zip(pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]):
        payload = bytes(payload)
        nbytes = len(payload)
        page_lines = codec.split_pages(payload)  # byte split, no parse
        if page_lines:
            try:
                # strict, like the light path's decode_doc: any non-UTF-8
                # page line fails the WHOLE doc as decode_error (a row,
                # never a task failure)
                decoded = [ln.decode("utf-8") for ln in page_lines]
            except UnicodeDecodeError:
                out.append(
                    (url, ts, lang, 0, 0, 792.0, 300, "\x00not-json", nbytes)
                )
                continue
            try:
                first = codec.loads_json(decoded[0])
            except Exception:
                first = {}
            geom = codec.detect_geometry([first] if first else [])
            n = len(decoded)
            for pno, line in enumerate(decoded):
                out.append(
                    (url, ts, lang, pno, n, geom["height_pt"], geom["output_dpi"],
                     line, nbytes)
                )
        elif page_lines is not None:
            # valid SYNPDF with zero pages: light path yields ([], "ok")
            out.append((url, ts, lang, 0, 0, 792.0, 300, json.dumps({"empty": True}), nbytes))
        elif cfg.ocr_strategy == "subprocess" and payload.startswith(b"%PDF"):
            # real PDF under the subprocess strategy: stage the payload
            # once to shared scratch, probe the page count + geometry, and
            # emit one slim (path, page) row per page — each rasterized by
            # its own task via gs -dFirstPage/-dLastPage downstream. This
            # is what breaks the multi-hundred-page skew the explode
            # exists for; the reference's analog is the in-host page pool
            # (pypdfocr_tesseract.py:138-150). Page-split staging REQUIRES
            # cfg.scratch_dir (a mount every executor can reach): with an
            # executor-local default the shuffled (path, page) rows would
            # point at files that exist on one host only and pages would
            # silently blank on a multi-host cluster — so no scratch_dir
            # (or a probe failure) means the safe single-task whole-doc
            # carrier instead.
            from .kernels import subproc

            n = None
            try:
                if cfg.scratch_dir is None:
                    raise RuntimeError("no shared scratch configured")
                path = subproc.stage_pdf(payload, cfg.scratch_dir)
                n = subproc.pdf_page_count(path, pdfinfo=cfg.pdfinfo_binary)
                geom = subproc.detect_dpi(
                    path, pdfimages=cfg.pdfimages_binary,
                    identify=cfg.identify_binary,
                )
            except Exception:
                n = None
            if n:
                for pno in range(n):
                    out.append(
                        (url, ts, lang, pno, n,
                         geom["height_pt"], geom["output_dpi"],
                         json.dumps({"pdf_path": path, "page": pno + 1,
                                     "greyscale": geom["greyscale"]}),
                         nbytes)
                    )
            else:
                import base64

                out.append(
                    (url, ts, lang, 0, 1, 792.0, 300,
                     json.dumps({"pdf_b64": base64.b64encode(payload).decode("ascii")}),
                     nbytes)
                )
        else:
            head = payload.lstrip()[:15].lower()
            if head.startswith(b"<!doctype") or head.startswith(b"<html"):
                # huge HTML doc: single raw pseudo-page, stripped downstream
                out.append(
                    (url, ts, lang, 0, 1, 792.0, 300,
                     json.dumps({"raw": payload.decode("utf-8", errors="replace")}),
                     nbytes)
                )
            else:
                # light path would return ([], "unsupported")
                out.append(
                    (url, ts, lang, 0, 0, 792.0, 300, json.dumps({"unsupported": True}), nbytes)
                )
    return pd.DataFrame(out, columns=[f.name for f in PAGE_SCHEMA.fields])


def _page_text_rows(pdf: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """Per-page OCR kernel: rasterize the native-dpi page at the document
    output dpi, emit+parse hOCR, reassemble text — the compute-heavy stage,
    running on hash-spread page rows. Emits a per-page ``status`` so heavy
    failures reach lineage (statuses mirror corpus.extract_doc: ok /
    decode_error / html_error / unsupported / error:<Type>)."""
    t0 = time.monotonic()
    out = []
    for url, ts, lang, pno, n, height, dpi, pjson, nbytes in zip(
        pdf["url"], pdf["warc_ts"], pdf["lang"], pdf["page_no"], pdf["n_pages"],
        pdf["height_pt"], pdf["output_dpi"], pdf["page_json"], pdf["byte_count"],
    ):
        status = "ok"
        try:
            page = codec.loads_json(pjson)
            if not isinstance(page, dict):
                page = None  # parity: corpus.decode_doc → None → decode_error
        except Exception:
            page = None
        if page is None:
            status, text = "decode_error", ""
        else:
            try:
                if "unsupported" in page:
                    text, status = "", "unsupported"
                elif "empty" in page:
                    text = ""
                elif "pdf_path" in page:
                    # distributed page split of a staged real PDF: this
                    # task rasterizes + OCRs exactly ONE page
                    from .kernels import subproc

                    try:
                        text = subproc.extract_page_subprocess(
                            page["pdf_path"], int(page["page"]), int(dpi),
                            bool(page.get("greyscale", True)), float(height),
                            gs_binary=cfg.gs_binary,
                            tesseract_binary=cfg.tesseract_binary,
                            preprocess=cfg.preprocess,
                            convert_binary=cfg.convert_binary,
                        )
                    except subproc.OcrError:
                        text, status = "", "ocr_error"
                    except subproc.SubprocessKernelError:
                        text, status = "", "decode_error"
                elif "pdf_b64" in page:
                    import base64

                    from .kernels import subproc

                    pages, status = subproc.extract_doc_subprocess(
                        base64.b64decode(page["pdf_b64"]),
                        gs_binary=cfg.gs_binary,
                        tesseract_binary=cfg.tesseract_binary,
                        preprocess=cfg.preprocess,
                        convert_binary=cfg.convert_binary,
                        pdfimages_binary=cfg.pdfimages_binary,
                        identify_binary=cfg.identify_binary,
                    )
                    # one output row PER PAGE, so reassembly keeps page
                    # boundaries and routes with the same per-page
                    # early-exit the light path uses (P2) — a combined
                    # pseudo-page would route differently for the same doc
                    for i, ptext in enumerate(pages):
                        pnorm = normalize_page_text(ptext)
                        out.append(
                            (url, ts, lang, i, len(pages), ptext, pnorm,
                             first_matching_folder(pnorm, cfg.targets),
                             status, int(nbytes))
                        )
                    if pages:
                        continue
                    text, n = "", 0
                elif "raw" in page:
                    try:
                        text = htmlx.strip_boilerplate(page["raw"])
                    except Exception:
                        text, status = "", "html_error"
                else:
                    raster = codec.rasterize([page], int(dpi))
                    hocr_doc = hocr.emit_hocr(raster)
                    # r6: text-only parse (see hocr.page_texts_from_hocr);
                    # emit_hocr of a single page always emits one
                    # page_1 div, so index 0 is the page parse_hocr_page
                    # would have selected by id
                    texts = hocr.page_texts_from_hocr(hocr_doc)
                    text = texts[0] if texts else ""
            except Exception as exc:  # data error → row, never task failure
                text, status = "", f"error:{type(exc).__name__}"
        norm = normalize_page_text(text)
        out.append(
            (url, ts, lang, int(pno), int(n), text, norm,
             first_matching_folder(norm, cfg.targets), status, int(nbytes))
        )
    share = (time.monotonic() - t0) * 1000.0 / max(len(out), 1)
    res = pd.DataFrame(out, columns=[f.name for f in PAGE_TEXT_SCHEMA.fields][:-1])
    res["wall_ms"] = share
    return res


def _make_reassemble(cfg: ExtractConfig):
    cols = [f.name for f in EXTRACTED_SCHEMA.fields]

    def reassemble(pdf):
        pdf = pdf.sort_values("page_no")
        url = pdf["url"].iloc[0]
        # doc status = first non-ok page status in page order (light-path
        # parity: a failed doc surfaces in lineage failure accounting)
        status = next((s for s in pdf["status"] if s != "ok"), "ok")
        if status == "ok":
            n_pages = int(pdf["n_pages"].iloc[0])
            page_texts = (
                ["" if t is None else t for t in pdf["page_text"]] if n_pages else []
            )
            text = "\n".join(page_texts)
        else:
            # light-path parity: a failed doc is (text="", n_pages=0)
            n_pages, page_texts, text = 0, [], ""
        norm_pages = [normalize_page_text(p) for p in page_texts]
        route = route_document(
            norm_pages, url, cfg.targets,
            use_filename=cfg.use_filename, default=cfg.default_route,
        )
        return pd.DataFrame(
            [(url, pdf["warc_ts"].iloc[0], pdf["lang"].iloc[0], text,
              normalize_page_text(text), route, n_pages, status,
              int(pdf["byte_count"].iloc[0]), float(pdf["wall_ms"].sum()))],
            columns=cols,
        )

    return reassemble


def _filename_route_expr(url_col, targets):
    """JVM form of ``first_matching_folder(url, targets)``: an ordered
    when-chain of substring tests on the lowered url — exact parity with
    the Python kernel because keywords are already lowercased
    (route.normalize_targets) and the match is plain substring."""
    low = F.lower(url_col)
    expr = None
    for folder, kws in targets:
        for kw in kws:
            cond = F.lit(True) if kw == "" else (F.instr(low, kw) > 0)
            expr = F.when(cond, F.lit(folder)) if expr is None else expr.when(cond, F.lit(folder))
    if expr is None:
        return F.lit(None).cast("string")
    return expr.otherwise(F.lit(None).cast("string"))


def _jvm_reassemble(pages_df: DataFrame, cfg: ExtractConfig) -> DataFrame:
    """Document reassembly as pure JVM aggregation — the default since
    round 4. The per-page Python stage already produced ``norm_text`` and
    ``route_match``; rebuilding the document is then collect_list +
    array_sort + array_join and an ordered route reduction, all inside
    whole-stage codegen. vs the former ``applyInPandas`` reassembly this
    removes one Python stage (and its Arrow round trip of every heavy
    document's full text) from the hot path; semantics are pinned
    row-identical by tests/test_pipeline.py::test_jvm_reassembly_parity.

    Semantics mirrored from the Python ``_make_reassemble`` exactly:

    * doc status = first non-ok page status in page order, via
      ``min(struct(page_no, status))`` over non-ok rows;
    * failed docs collapse to (text='', n_pages=0) and route only through
      the filename fallback / default — page matches are ignored;
    * doc text = page texts joined by newline; doc norm = per-page norms
      joined by space (ascii-ignore distributes over concat and the
      joining newline itself normalizes to a space, so this equals
      ``normalize_page_text(text)`` — the S6 contract);
    * route = first page (by page_no) with a match → its folder, else
      filename fallback (when enabled), else the default.
    """
    struct_sorted = F.array_sort(
        F.collect_list(F.struct("page_no", "n_pages", "page_text", "norm_text", "route_match"))
    )
    g = pages_df.groupBy("url").agg(
        struct_sorted.alias("_p"),
        F.min(
            F.when(F.col("status") != "ok", F.struct("page_no", "status"))
        ).alias("_bad"),
        F.min("warc_ts").alias("warc_ts"),
        F.min("lang").alias("lang"),
        F.min("byte_count").alias("byte_count"),
        F.sum("wall_ms").alias("wall_ms"),
    )
    ok = F.col("_bad").isNull()
    page_route = F.get(
        F.filter("_p", lambda x: x["route_match"].isNotNull()), 0
    )["route_match"]
    route = F.when(ok, page_route).otherwise(F.lit(None).cast("string"))
    if cfg.use_filename:
        route = F.coalesce(route, _filename_route_expr(F.col("url"), cfg.targets))
    route = F.coalesce(route, F.lit(cfg.default_route).cast("string"))
    return g.select(
        F.col("url"),
        F.col("warc_ts"),
        F.col("lang"),
        F.when(ok, F.array_join(F.transform("_p", lambda x: x["page_text"]), "\n", ""))
        .otherwise("").alias("extracted_text"),
        F.when(ok, F.array_join(F.transform("_p", lambda x: x["norm_text"]), " ", ""))
        .otherwise("").alias("extracted_norm"),
        route.alias("route"),
        F.when(ok, F.get("_p", 0)["n_pages"]).otherwise(F.lit(0)).cast("int").alias("n_pages"),
        F.when(ok, F.lit("ok")).otherwise(F.col("_bad")["status"]).alias("status"),
        F.col("byte_count"),
        F.col("wall_ms"),
    )


# ------------------------------------------------------------------ pipeline
def source_filter(corpus_df: DataFrame) -> DataFrame:
    """S3/P5: drop the engine's own outputs before any Python runs
    (ref: pypdfocr/pypdfocr_watcher.py:95-96)."""
    cond = None
    for suf in EXCLUDED_SUFFIXES:
        c = ~F.col("url").endswith(suf)
        cond = c if cond is None else (cond & c)
    return corpus_df.where(cond)


def extract(corpus_df: DataFrame, cfg: ExtractConfig | None = None) -> DataFrame:
    """Full extraction: corpus rows → EXTRACTED_SCHEMA rows (module doc)."""
    cfg = cfg or ExtractConfig()
    # resolve ONCE on the driver so executors never probe PATH; the
    # resolved value ships inside the broadcast config closure. Always
    # routed through resolve_ocr_strategy so a typo'd strategy string
    # raises here instead of silently running the builtin codec.
    from dataclasses import replace

    from . import envcheck

    cfg = replace(cfg, ocr_strategy=envcheck.resolve_ocr_strategy(cfg.ocr_strategy))
    spark = corpus_df.sparkSession
    src = source_filter(corpus_df)

    # prefer the stats-bearing n_bytes column: `n_bytes > T` prunes at the
    # parquet/Iceberg row-group level (min/max stats), so each branch's
    # scan skips the other branch's row groups. A coalesce() wrapper
    # would defeat pushdown, so the bare column is compared and rows with
    # a null n_bytes fall to the light branch (Or(IsNull, LtEq) pushes).
    if "n_bytes" in corpus_df.columns:
        light = src.where(
            F.col("n_bytes").isNull() | (F.col("n_bytes") <= cfg.heavy_payload_bytes)
        )
        heavy = src.where(F.col("n_bytes") > cfg.heavy_payload_bytes)
    else:
        is_heavy = F.length(F.col("html")) > cfg.heavy_payload_bytes
        light = src.where(~is_heavy)
        heavy = src.where(is_heavy)

    light_out = light.mapInPandas(
        lambda it: (_extract_rows(pdf, cfg) for pdf in it), EXTRACTED_SCHEMA
    )

    # After the salt, page rows are uniform-cost (one page each), so the
    # right partition count is the cluster's parallelism — not a multiple:
    # every extra partition is one more Python-worker dispatch, and the
    # r4 sweep measured 4× parallelism costing ~2× the whole stage in
    # tiny-task overhead (32→128 partitions: 1.04s→2.7s on 7.9k pages).
    # Page-count skew is already broken by the per-page salt itself;
    # clusters with heterogeneous page cost can raise cfg.page_partitions.
    k = cfg.page_partitions or spark.sparkContext.defaultParallelism
    heavy_out = (
        # Explode IN PLACE at the scan — no pre-spread shuffle. The
        # explode is a byte split (no parse, ~2 ms/doc), so input-file
        # clustering of heavy docs costs microseconds per task, while the
        # pre-repartition it replaced shuffled every heavy document's
        # RAW payload a second time (the salt exchange right after this
        # ships the same bytes page-split — once is enough).
        heavy.mapInPandas(lambda it: (_explode_rows(pdf, cfg) for pdf in it), PAGE_SCHEMA)
        .repartition(k, F.xxhash64("url", "page_no"))
        .mapInPandas(lambda it: (_page_text_rows(pdf, cfg) for pdf in it), PAGE_TEXT_SCHEMA)
    )
    if cfg.python_reassembly:
        heavy_out = heavy_out.groupBy("url").applyInPandas(
            _make_reassemble(cfg), EXTRACTED_SCHEMA
        )
    else:
        heavy_out = _jvm_reassemble(heavy_out, cfg)
    return light_out.unionByName(heavy_out)


def materialize_corpus(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Write the derived corpus as a parquet table and return a reader.

    In production the Common-Crawl corpus IS a table (Iceberg) — the
    pipeline scans it, it is not generated mid-query. Materializing makes
    the sandbox match that shape and keeps the light/heavy branch split
    from re-running the (expensive) payload construction: each branch
    re-scans parquet with its own pushed filter instead.

    r6 layout (guide §6 "partitioning and sort order on write determine
    how well readers can skip data"): light and heavy rows are written
    as SEPARATE file sets (one overwrite + one append into the same
    directory — same schema, no partition column). The former layout
    round-robined heavy docs across every file and only sorted within
    partitions, so each file's n_bytes min/max spanned the whole range
    and NEITHER branch's pushed filter could skip anything — both
    branches scanned (and Arrow-shipped) the full corpus. Now the light
    branch's ``n_bytes <= T`` prunes every heavy file at file level and
    vice versa. Heavy rows get ~par/8 files (they are few but fat — at
    sf1.0, 1% of docs carry ~60% of bytes), light rows the rest.
    Iceberg mapping: a size-class partition / z-order at ingest.
    """
    from .config import HEAVY_PAYLOAD_BYTES

    df = build_corpus_df(spark, sf_dir).persist()
    par = spark.sparkContext.defaultParallelism
    light = df.where(F.col("n_bytes") <= HEAVY_PAYLOAD_BYTES)
    heavy = df.where(F.col("n_bytes") > HEAVY_PAYLOAD_BYTES)
    # both classes get one file per core: heavy docs are few but carry
    # most bytes, and the heavy branch's page-explode stage parallelizes
    # at FILE granularity (measured: 4 heavy files pinned the explode to
    # 4 tasks ≈ 3 s; par files → sub-second). At warehouse scale the
    # equivalent knob is the table's target file size, not a file count.
    light.repartition(par).sortWithinPartitions("n_bytes").write.mode(
        "overwrite"
    ).parquet(path)
    heavy.repartition(par).sortWithinPartitions("n_bytes").write.mode(
        "append"
    ).parquet(path)
    df.unpersist()
    return spark.read.parquet(path)


def extract_from_documents(
    spark: SparkSession,
    sf_dir: str,
    cfg: ExtractConfig | None = None,
    corpus_path: str | None = None,
) -> DataFrame:
    """Convenience: driver documents table → corpus → extraction.

    With ``corpus_path`` the corpus is materialized (or reused if already
    written) and extraction scans it like the production table.
    """
    if corpus_path is None:
        return extract(build_corpus_df(spark, sf_dir), cfg)
    try:
        corpus_df = spark.read.parquet(corpus_path)
        if not corpus_df.head(1):  # plan-level probe, no RDD conversion
            raise ValueError("empty corpus")
    except Exception:
        corpus_df = materialize_corpus(spark, sf_dir, corpus_path)
    return extract(corpus_df, cfg)
