"""Pluggable sinks (SURVEY §2.2 / §2.10) — the reference's ``PyFiler`` ABC
(``move_to_matching_folder`` / ``file_original`` / ``add_folder_target``,
ref: pypdfocr/pypdfocr_filer.py:17-105) becomes a sink trait over the
routed DataFrame; the two reference impls map to:

* K2 directory filer  → :class:`DirsSink` — routing is a *column*, so the
  per-file ``shutil.move`` + mkdir-p disappears into
  ``partitionBy(route)``; the ``_1/_2`` name-uniquify probe loop
  (ref: pypdfocr/pypdfocr_filer.py:52-65) becomes a ``row_number`` window.
* K4 Evernote filer   → :class:`EvernoteSink` stub — the API-call shape
  (notebook check-or-create, note with an md5-hashed PDF resource,
  ref: pypdfocr/pypdfocr_filer_evernote.py:183-288) is preserved as a
  ``foreachBatch``-style callable; the client itself is gated (no network
  / evernote SDK here).
* K5 email notifier   → :func:`email_summary` — the driver-side SMTP
  report (original / converted / filing summary,
  ref: pypdfocr/pypdfocr.py:410-438) rendered from the lineage table;
  SMTP send gated behind import/availability.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class RouteSink(ABC):
    """Sink trait: consume the routed extraction output."""

    @abstractmethod
    def write(self, extracted: DataFrame, out_dir: str) -> None: ...


def original_move_manifest(
    extracted: DataFrame, original_move_folder: str | None
) -> DataFrame:
    """K3: the original-move filer as data. The reference physically
    ``shutil.move``s the source PDF into ``original_move_folder``,
    uniquifying the basename by appending a version integer
    (ref: pypdfocr/pypdfocr_filer_dirs.py:37-48 +
    pypdfocr/pypdfocr_filer.py:52-65). The corpus table is immutable, so
    the Spark-first form is a *manifest*: one row per document with its
    post-move location (url, moved_to); ``moved_to = url`` when no move
    folder is configured (the reference's leave-untouched branch,
    ref :39-41). A deployment applies the manifest with its object-store
    rename API (S3 copy+delete / HDFS rename) — or snapshots it into an
    Iceberg table column.
    """
    if not original_move_folder:
        return extracted.select("url", F.col("url").alias("moved_to"))
    basename = F.regexp_extract(F.col("url"), r"([^/]+)$", 1)
    stem = F.regexp_extract(basename, r"^(.*?)(\.[A-Za-z0-9]+)?$", 1)
    ext = F.regexp_extract(basename, r"(\.[A-Za-z0-9]+)?$", 1)
    w = Window.partitionBy(basename).orderBy("url")
    seq = F.row_number().over(w) - 1
    uniq = F.concat(
        stem,
        F.when(seq == 0, F.lit("")).otherwise(F.concat(F.lit("_"), seq.cast("string"))),
        ext,
    )
    return extracted.select(
        "url",
        F.concat(F.lit(original_move_folder.rstrip("/") + "/"), uniq).alias("moved_to"),
    )


class DirsSink(RouteSink):
    """K2: write route-partitioned parquet with uniquified artifact names.

    ``artifact_name`` reproduces the reference's collision policy: the
    first file keeps its basename, later ones get ``_1``, ``_2``, …
    (ref: pypdfocr/pypdfocr_filer.py:52-65), deterministically ordered by
    url instead of filesystem probe order.
    """

    def write(self, extracted: DataFrame, out_dir: str) -> None:
        self.with_artifact_names(extracted).write.mode("overwrite").partitionBy(
            "route"
        ).parquet(out_dir)

    @staticmethod
    def with_artifact_names(extracted: DataFrame) -> DataFrame:
        basename = F.regexp_extract(F.col("url"), r"([^/]+?)(?:\.[a-z]+)?$", 1)
        w = Window.partitionBy("route", basename).orderBy("url")
        seq = F.row_number().over(w) - 1
        return extracted.withColumn(
            "artifact_name",
            F.concat(
                basename,
                F.when(seq == 0, F.lit("")).otherwise(
                    F.concat(F.lit("_"), seq.cast("string"))
                ),
                F.lit("_ocr.pdf"),
            ),
        )


class EvernoteSink(RouteSink):
    """K4 stub: builds the note payload rows (route → notebook, md5
    resource hash ≙ ``F.md5``, ref: pypdfocr_filer_evernote.py:221-227)
    and hands each partition to an uploader callable. The real uploader
    needs the Evernote SDK + credentials — unavailable here, so the
    default raises on use while keeping the dataflow testable."""

    def __init__(self, uploader=None):
        self._uploader = uploader

    def note_rows(self, extracted: DataFrame) -> DataFrame:
        return extracted.select(
            F.col("route").alias("notebook"),
            F.col("url").alias("note_title"),
            F.md5(F.coalesce(F.col("extracted_text"), F.lit(""))).alias("resource_md5"),
            F.length(F.coalesce(F.col("extracted_text"), F.lit(""))).alias("resource_len"),
        )

    def write(self, extracted: DataFrame, out_dir: str) -> None:
        if self._uploader is None:
            raise NotImplementedError(
                "EvernoteSink needs an uploader (SDK + OAuth) on a real deployment"
            )
        rows = self.note_rows(extracted)
        uploader = self._uploader
        rows.foreachPartition(lambda it: uploader(list(it)))


def email_summary(lineage_df: DataFrame, run_id: str) -> str:
    """K5: the post-job report body (driver-side; sent by
    :func:`send_email_summary`, ref: pypdfocr/pypdfocr.py:410-438)."""
    rows = lineage_df.where(F.col("run_id") == run_id).collect()
    docs = sum(r["doc_count"] for r in rows)
    fails = [u for r in rows for u in r["failures"]]
    lines = [
        f"pypdfocr_spark run {run_id}",
        f"documents committed: {docs}",
        f"partitions: {len(rows)}",
        f"failures: {len(fails)}",
    ]
    lines += [f"  failed: {u}" for u in fails[:20]]
    return "\n".join(lines)


def send_email_summary(body: str, mail_config: dict, subject: str) -> None:
    """K5 transport: SMTP + STARTTLS + login + sendmail + quit, the exact
    call sequence and config keys of the reference's ``_send_email``
    (ref: pypdfocr/pypdfocr.py:410-438: mail_from_addr / mail_to_list /
    mail_smtp_server / mail_smtp_login / mail_smtp_password; From/To/
    Subject header block). Driver-side, post-job — never a data-plane op."""
    import smtplib

    from_addr = mail_config["mail_from_addr"]
    to_addr_list = mail_config["mail_to_list"]
    login = mail_config["mail_smtp_login"]

    header = f"From: {login}\n"
    header += "To: {}\n".format(",".join(to_addr_list))
    header += f"Subject: {subject}\n\n"
    server = smtplib.SMTP(mail_config["mail_smtp_server"])
    try:
        server.starttls()
        server.login(login, mail_config["mail_smtp_password"])
        server.sendmail(from_addr, to_addr_list, header + body)
    finally:
        server.quit()
