"""Subprocess-backed rasterize/OCR kernels for real clusters (T1/T2/T4).

The sandbox has no ghostscript/tesseract/pdfimages binaries, so the
pipeline's default strategy is the deterministic builtin codec; on a real
cluster ``envcheck`` selects this module instead (the reference's
pluggable ``binary:`` override design, ref: pypdfocr/pypdfocr.py:314-324).
Everything here is unit-tested with a mocked ``subprocess`` — exactly how
the reference tests its binary wrappers (ref: test/test_tesseract.py,
test/test_gs.py) — AND driven end-to-end through real process boundaries
by tests/test_subproc_e2e.py, which generates stub gs/tesseract/pdfinfo/
pdfimages/identify executables and asserts byte-identical extraction vs
the builtin path (the analog of the reference's real-binary e2e,
ref: test/test_pypdfocr.py:51-83).

Reference parity, cited per function:

* Ghostscript device table and option strings — pypdfocr_gs.py:65-74;
* ``_run_gs`` command shape (-q -dNOPAUSE ... -sOutputFile=... -c quit)
  and the '.getdeviceparams' outdated-gs detection — pypdfocr_gs.py:170-181;
* rasterize driver (greyscale → jpeggray device, '%d' page template,
  pre-existing output cleanup) — pypdfocr_gs.py:184-218;
* DPI detection via ``pdfimages -list`` + ``identify`` (second image row,
  x/y dpi from px/size*density, max, clamp ≥300, 5% x/y sanity warning)
  — pypdfocr_gs.py:117-166;
* tesseract command shape (-psm 1 -c hocr_font_info=1 -l LANG hocr) and
  the ``.html`` → ``.hocr`` output-extension fallback probe (tesseract
  <3.03 vs ≥3.03) — pypdfocr_tesseract.py:154-183.

Deliberate deltas from the reference (Spark-first, not a port):

* argv lists with ``shell=False`` instead of interpolated shell strings —
  same commands, no quoting bugs on hostile filenames;
* no in-kernel ``multiprocessing.Pool`` (ref: pypdfocr_tesseract.py:138-150)
  — parallelism is Spark's job, one task per document/page;
* :func:`rasterize_page_range` adds -dFirstPage/-dLastPage so the salted
  page-explode can rasterize ONE page of a real PDF per task — the
  distributed replacement for the reference's single-host page pool.
"""

from __future__ import annotations

import os
import re
import subprocess
import tempfile

from .codec import round_half_away
from . import hocr

# ref: pypdfocr_gs.py:65-74 — device name → (file extension, gs options)
GS_DEVICES: dict[str, tuple[str, list[str]]] = {
    "tiff": ("tiff", ["-sDEVICE=tiff24nc", "-r{dpi}"]),
    "jpg": ("jpg", ["-sDEVICE=jpeg", "-dJPEGQ=75", "-r{dpi}"]),
    "jpggrey": ("jpg", ["-sDEVICE=jpeggray", "-dJPEGQ=75", "-r{dpi}"]),
    "png": ("png", ["-sDEVICE=png16m", "-r{dpi}"]),
    "pnggrey": ("png", ["-sDEVICE=pngmono", "-r{dpi}"]),
    "tifflzw": ("tiff", ["-sDEVICE=tifflzw", "-r{dpi}"]),
    "tiffg4": ("tiff", ["-sDEVICE=tiffg4", "-r{dpi}"]),
    "pnm": ("pnm", ["-sDEVICE=pnmraw", "-r{dpi}"]),
    "pgm": ("pgm", ["-sDEVICE=pgm", "-r{dpi}"]),
}

DEFAULT_GEOMETRY = {
    "output_dpi": 300,  # rasterization floor (ref: pypdfocr_gs.py:60)
    "greyscale": True,  # ref default (pypdfocr_gs.py:61)
    "width_pt": 612.0,
    "height_pt": 792.0,
}


class SubprocessKernelError(RuntimeError):
    """A binary-backed kernel failed on this document (data error)."""


class GsOutdatedError(SubprocessKernelError):
    """Ghostscript too old for the requested device
    (ref: pypdfocr_gs.py:176-178 '.getdeviceparams' probe)."""


class OcrError(SubprocessKernelError):
    """tesseract produced no hOCR output (ref: pypdfocr_tesseract.py:181-183)."""


# ------------------------------------------------------------- ghostscript
def build_gs_cmd(
    binary: str,
    device: str,
    dpi: int,
    output_template: str,
    pdf_path: str,
    first_page: int | None = None,
    last_page: int | None = None,
) -> list[str]:
    """gs argv mirroring ``_run_gs`` (ref: pypdfocr_gs.py:171) plus the
    optional page-range flags used by the distributed page split."""
    ext, options = GS_DEVICES[device]
    cmd = [binary, "-q", "-dNOPAUSE", "-dBATCH"]
    if first_page is not None:
        cmd.append(f"-dFirstPage={first_page}")
    if last_page is not None:
        cmd.append(f"-dLastPage={last_page}")
    cmd += [o.format(dpi=dpi) for o in options]
    cmd += [f"-sOutputFile={output_template}", pdf_path]
    return cmd


def run_gs(cmd: list[str]) -> None:
    """Run a gs command; map failure modes like the reference
    (ref: pypdfocr_gs.py:170-181)."""
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        blob = (e.output or "") + (e.stderr or "")
        if "undefined in .getdeviceparams" in blob:
            raise GsOutdatedError(
                "ghostscript is too old for this device; please update"
            ) from e
        raise SubprocessKernelError(f"gs failed: {blob[:500]}") from e


def detect_dpi(pdf_path: str, pdfimages: str = "pdfimages", identify: str = "identify") -> dict:
    """T1 DPI/geometry detection via ``pdfimages -list`` + ``identify``,
    reproducing the reference's arithmetic exactly
    (ref: pypdfocr_gs.py:117-166): second image row gives raster px dims
    and the gray flag; identify gives page size + density; dpi =
    round(px/size*density) per axis (py2 half-away rounding), take the
    max, clamp ≥300. Any probe failure falls back to the defaults —
    graceful, like the reference's warn-and-continue."""
    geom = dict(DEFAULT_GEOMETRY)
    try:
        out = subprocess.run(
            [pdfimages, "-list", pdf_path], check=True, capture_output=True, text=True
        ).stdout
    except Exception:
        return geom
    lines = out.splitlines()
    if len(lines) < 3:  # empty pdf (ref :132-135)
        return geom
    cols = lines[2].split()
    if len(cols) < 6 or cols[2] != "image":  # ref :138-141
        return geom
    x_px, y_px, grey = int(cols[3]), int(cols[4]), cols[5] == "gray"
    geom["greyscale"] = grey
    try:
        out = subprocess.run(
            [identify, "-format", "%w %x %h %y\\n", pdf_path],
            check=True, capture_output=True, text=True,
        ).stdout
        first = out.splitlines()[0].replace("Undefined", "")
        width, xdensity, height, ydensity = [float(x) for x in first.split()]
        xdpi = round_half_away(x_px / width * xdensity)
        ydpi = round_half_away(y_px / height * ydensity)
        output_dpi = max(xdpi, ydpi)
        if output_dpi < 300:
            output_dpi = 300
        geom["output_dpi"] = int(output_dpi)
        # page size in points for the hOCR coordinate transform
        geom["width_pt"] = width / xdensity * 72.0 if xdensity else geom["width_pt"]
        geom["height_pt"] = height / ydensity * 72.0 if ydensity else geom["height_pt"]
    except Exception:
        pass  # identify unavailable → keep dpi default (ref :164-166)
    return geom


def make_imgs_from_pdf(
    pdf_path: str,
    dpi: int,
    greyscale: bool,
    binary: str = "gs",
    first_page: int | None = None,
    last_page: int | None = None,
    out_dir: str | None = None,
) -> list[str]:
    """Rasterize a PDF to per-page images, returning the image paths in
    page order (ref: pypdfocr_gs.py:184-218: device by greyscale, '%d'
    output template, pre-existing outputs removed; the filename-sort page
    recovery is the reference's natural sort, pypdfocr_pdf.py:261-267).

    ``out_dir`` redirects the output images (default: next to the PDF).
    NOTE: gs numbers '%d' outputs from 1 regardless of -dFirstPage, and
    the cleanup loop deletes matching stale outputs first — so concurrent
    callers over the SAME pdf must pass distinct ``out_dir``s (which is
    what :func:`rasterize_page_range` does)."""
    device = "jpggrey" if greyscale else "jpg"  # ref :196-203
    ext = GS_DEVICES[device][0]
    stem = os.path.splitext(os.path.basename(pdf_path))[0]
    dirname = out_dir or os.path.dirname(pdf_path) or "."
    pat = re.compile(re.escape(stem) + r"_(\d+)\." + ext + "$")
    for fn in os.listdir(dirname):  # ref :209-211 cleanup
        if pat.match(fn):
            os.remove(os.path.join(dirname, fn))
    template = os.path.join(dirname, f"{stem}_%d.{ext}")
    run_gs(build_gs_cmd(binary, device, dpi, template, pdf_path, first_page, last_page))
    found = [
        os.path.join(dirname, fn) for fn in os.listdir(dirname) if pat.match(fn)
    ]
    return sorted(found, key=hocr.natural_keys)


def rasterize_page_range(
    pdf_path: str, page: int, dpi: int, greyscale: bool, binary: str = "gs"
) -> tuple[bytes, str]:
    """One page of a real PDF → (image bytes, file extension), for the
    salted page-explode stage: each task runs gs with
    -dFirstPage/-dLastPage instead of one host rasterizing the whole
    document (the distributed replacement for the reference's in-host
    page pool, pypdfocr_tesseract.py:138-150).

    Each call rasterizes into its own fresh temp directory, owned and
    removed HERE — gs restarts '%d' numbering at 1 regardless of the page
    range, so concurrent tasks over the same PDF would otherwise collide
    on (and mutually delete) each other's output files, and a
    caller-owned directory would leak one dir per page task until the
    executor disk fills. Page identity comes from the ``page`` argument,
    never from the output filename."""
    with tempfile.TemporaryDirectory(prefix="pypdfocr_spark_page_") as out_dir:
        imgs = make_imgs_from_pdf(
            pdf_path, dpi, greyscale, binary,
            first_page=page, last_page=page, out_dir=out_dir,
        )
        if not imgs:
            raise SubprocessKernelError(f"gs produced no image for page {page}")
        with open(imgs[0], "rb") as f:
            return f.read(), os.path.splitext(imgs[0])[1].lstrip(".")


# -------------------------------------------------- ImageMagick preprocess
def build_convert_cmd(binary: str, in_path: str, out_path: str) -> list[str]:
    """ImageMagick ``convert`` argv with the reference's exact option
    chain (ref: pypdfocr/pypdfocr_preprocess.py:65-95): clone → grayscale
    negative → local adaptive threshold 15x15+5% → contrast stretch,
    composited back as opacity, then blur 1x1, adaptive-sharpen 0x2, and
    the vertical-rule Thinning (Rectangle:1x30 — tesseract <3.03 ignores
    text near table rules). The reference interpolates a shell string
    with ``\\(`` escapes and an os.name=='nt' special case
    (ref :70-74); argv form needs neither — the parens are plain tokens
    and there is no shell."""
    return [
        binary, in_path, "-respect-parenthesis",
        "(", "-clone", "0",
        "-colorspace", "gray", "-negate", "-lat", "15x15+5%",
        "-contrast-stretch", "0",
        ")", "-compose", "copy_opacity", "-composite",
        "-opaque", "none", "+matte", "-modulate", "100,100",
        "-blur", "1x1",
        "-adaptive-sharpen", "0x2",
        "-negate",
        "-define", "morphology:compose=darken",
        "-morphology", "Thinning", "Rectangle:1x30+0+0",
        "-negate",
        out_path,
    ]


def preprocess_img_subprocess(img_path: str, binary: str = "convert") -> str:
    """T3 preprocess over the real binary: writes
    ``<base>_preprocess<ext>`` and returns its path; ANY failure returns
    the input path unchanged (the reference's graceful contract —
    ``cmd()`` swallows CalledProcessError and ``_run_preprocess`` then
    returns in_filename, ref: pypdfocr_preprocess.py:55-61,92-93)."""
    base, ext = os.path.splitext(img_path)
    out_path = f"{base}_preprocess{ext}"
    try:
        subprocess.run(
            build_convert_cmd(binary, img_path, out_path),
            check=True, capture_output=True, text=True,
        )
    except Exception:
        return img_path
    return out_path if os.path.isfile(out_path) else img_path


# ------------------------------------------------- distributed page split
def pdf_page_count(pdf_path: str, pdfinfo: str = "pdfinfo") -> int | None:
    """Page-count probe for the distributed page split: ``pdfinfo``'s
    ``Pages: N`` line ONLY. Returns ``None`` when the probe fails, in
    which case the caller falls back to whole-document processing
    (graceful, like the reference's warn-and-continue probes,
    ref: pypdfocr_gs.py:132-141).

    A ``pdfimages -list`` fallback (max listed page index) was removed
    deliberately: it counts pages that CONTAIN raster images, so a
    10-page PDF whose last 5 pages are text/vector-only probes as 5 and
    the page split would silently drop the rest with status 'ok' —
    silent data loss. An uncertain count must read as None (safe
    whole-doc path), never as a plausible underestimate.

    The reference never needs this number up front — it learns the page
    count from the filenames gs produced (ref: pypdfocr_pdf.py:261-267).
    Distributing the rasterization requires knowing it BEFORE any gs runs,
    hence the probe."""
    try:
        out = subprocess.run(
            [pdfinfo, pdf_path], check=True, capture_output=True, text=True
        ).stdout
        m = re.search(r"^Pages:\s+(\d+)", out, re.MULTILINE)
        if m:
            return int(m.group(1))
    except Exception:
        pass
    return None


def stage_pdf(payload: bytes, scratch_dir: str) -> str:
    """Stage a PDF payload once so every per-page task can read it:
    content-addressed (``<md5>.pdf``) with an atomic rename, so task
    retries and concurrent attempts over the same document are idempotent
    and never observe a half-written file.

    ``scratch_dir`` must be reachable from every executor — on a real
    cluster a shared scratch mount (HDFS/NFS/FUSE) with a job-scoped
    prefix removed at job commit (:func:`clean_scratch`); in local mode
    any temp dir. Staging trades one write + n_pages reads of the PDF
    against shipping the full payload inside every exploded page row
    through the shuffle (n_pages × size of shuffle volume — the wrong
    side of the trade for multi-hundred-page documents)."""
    import hashlib

    os.makedirs(scratch_dir, exist_ok=True)
    digest = hashlib.md5(payload).hexdigest()
    path = os.path.join(scratch_dir, f"{digest}.pdf")
    if os.path.exists(path):
        return path
    fd, tmp = tempfile.mkstemp(dir=scratch_dir, suffix=".pdf.part")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def clean_scratch(scratch_dir: str, max_age_s: float = 86_400.0) -> int:
    """OPERATOR MAINTENANCE sweep of a shared scratch mount: remove
    staged PDFs and crashed jobs' ``job-*`` subdirs older than
    ``max_age_s`` (K6 temp-cleanup analog, ref: pypdfocr/pypdfocr.py
    cleanup of _preprocessed/temp outputs). NOT called automatically at
    job end (a job removes only its own job-scoped subdir): directory
    mtimes stop updating once staging ends, so ``max_age_s`` MUST exceed
    the longest job's staging-to-finish wall time or this sweep deletes
    a still-running job's staged files. Returns entries removed."""
    import time as _time

    removed = 0
    if not os.path.isdir(scratch_dir):
        return 0
    cutoff = _time.time() - max_age_s
    for fn in os.listdir(scratch_dir):
        p = os.path.join(scratch_dir, fn)
        try:
            if fn.startswith("job-") and os.path.isdir(p):
                # a crashed job's whole staging subdir — see the
                # max_age_s contract in the docstring (dir mtime goes
                # stale once staging ends; the age must exceed job wall)
                if os.path.getmtime(p) < cutoff:
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)
                    removed += 1
            elif fn.endswith(".pdf") or fn.endswith(".pdf.part"):
                if os.path.getmtime(p) < cutoff:
                    os.remove(p)
                    removed += 1
        except OSError:
            pass  # concurrent cleanup / in-flight rename
    return removed


def extract_page_subprocess(
    pdf_path: str,
    page: int,
    dpi: int,
    greyscale: bool,
    height_pt: float,
    gs_binary: str = "gs",
    tesseract_binary: str = "tesseract",
    lang: str = "eng",
    preprocess: bool = False,
    convert_binary: str = "convert",
) -> str:
    """ONE page of a staged real PDF → extracted text: the per-task body
    of the distributed page split (rasterize_page_range's
    -dFirstPage/-dLastPage → tesseract hOCR → the engine's hOCR parse).
    This is the reference's in-host page pool
    (pypdfocr_tesseract.py:138-150) re-expressed as one Spark task per
    page; ``page`` is 1-based like gs's -dFirstPage.

    Raises :class:`SubprocessKernelError` (gs) / :class:`OcrError`
    (tesseract) — the caller maps these to the same decode_error /
    ocr_error row statuses the whole-document kernel uses."""
    img_bytes, ext = rasterize_page_range(pdf_path, page, dpi, greyscale, gs_binary)
    with tempfile.TemporaryDirectory(prefix="pypdfocr_spark_ocr_") as td:
        img_path = os.path.join(td, f"page_{page}.{ext}")
        with open(img_path, "wb") as f:
            f.write(img_bytes)
        if preprocess:
            img_path = preprocess_img_subprocess(img_path, convert_binary)  # graceful
        hocr_path = make_hocr_from_img(img_path, tesseract_binary, lang)
        with open(hocr_path, encoding="utf-8") as f:
            spans = hocr.parse_hocr_page(f.read(), 1, height_pt, dpi)
    return hocr.page_text_from_spans(spans)


# --------------------------------------------------------------- tesseract
def _tesseract_psm_flag(binary: str = "tesseract") -> str:
    """'-psm' for tesseract < 3.05, '--psm' from 3.05 on (the CLI renamed
    the flag; the reference predates the rename and hardcodes '-psm',
    ref: pypdfocr_tesseract.py:163 — hardcoding it here would break OCR
    on every modern (4.x/5.x) cluster that the version gate admits).
    Probed once per process and cached."""
    if binary in _PSM_CACHE:
        return _PSM_CACHE[binary]
    flag = "--psm"
    try:
        out = subprocess.run(
            [binary, "--version"], capture_output=True, text=True, timeout=10
        )
        blob = (out.stdout or "") + (out.stderr or "")
        m = re.search(r"tesseract\s+v?(\d+)\.(\d+)", blob)
        if m and (int(m.group(1)), int(m.group(2))) < (3, 5):
            flag = "-psm"
    except Exception:
        pass  # unknown → modern spelling
    _PSM_CACHE[binary] = flag
    return flag


_PSM_CACHE: dict[str, str] = {}


def build_tesseract_cmd(
    binary: str, img_path: str, out_base: str, lang: str = "eng",
    psm_flag: str | None = None,
) -> list[str]:
    """tesseract argv mirroring the reference command shape
    (ref: pypdfocr_tesseract.py:163): PSM 1 + hocr_font_info=1 -l LANG hocr,
    with the psm flag spelled per the binary's version (see
    :func:`_tesseract_psm_flag`)."""
    if psm_flag is None:
        psm_flag = _tesseract_psm_flag(binary)
    return [binary, img_path, out_base, psm_flag, "1", "-c", "hocr_font_info=1",
            "-l", lang, "hocr"]


def make_hocr_from_img(
    img_path: str, binary: str = "tesseract", lang: str = "eng"
) -> str:
    """OCR one page image to hOCR, probing ``.html`` then ``.hocr``
    (tesseract <3.03 wrote .html, ≥3.03 writes .hocr —
    ref: pypdfocr_tesseract.py:168-183)."""
    base = os.path.splitext(img_path)[0]
    try:
        subprocess.run(
            build_tesseract_cmd(binary, img_path, base, lang),
            check=True, capture_output=True, text=True,
        )
    except subprocess.CalledProcessError as e:
        # keep probing: old tesseracts returned nonzero on warnings
        # (the reference warns and still checks for output, ref :165-170)
        _ = e
    for ext in (".html", ".hocr"):
        if os.path.isfile(base + ext):
            return base + ext
    raise OcrError(f"tesseract produced no hOCR for {img_path}")


# ------------------------------------------------------------ doc kernel
def extract_doc_subprocess(
    payload: bytes,
    gs_binary: str = "gs",
    tesseract_binary: str = "tesseract",
    lang: str = "eng",
    preprocess: bool = False,
    convert_binary: str = "convert",
    pdfimages_binary: str = "pdfimages",
    identify_binary: str = "identify",
) -> tuple[list[str], str]:
    """Whole-document extraction over real binaries: payload → temp pdf →
    gs page images → per-page tesseract hOCR → parse with the engine's
    hOCR kernel → per-page texts. Same contract as ``corpus.extract_doc``
    so the pipeline can swap strategies per document."""
    if not payload.startswith(b"%PDF"):
        return ([], "unsupported")
    with tempfile.TemporaryDirectory(prefix="pypdfocr_spark_") as td:
        pdf_path = os.path.join(td, "doc.pdf")
        with open(pdf_path, "wb") as f:
            f.write(payload)
        geom = detect_dpi(pdf_path, pdfimages=pdfimages_binary, identify=identify_binary)
        try:
            imgs = make_imgs_from_pdf(
                pdf_path, geom["output_dpi"], geom["greyscale"], gs_binary
            )
        except SubprocessKernelError:
            return ([], "decode_error")
        pages = []
        for img in imgs:
            try:
                if preprocess:
                    # opt-in like the reference's --preprocess flag
                    # (ref: pypdfocr/pypdfocr.py:186-193); failure returns
                    # the original image, never fails the page
                    img = preprocess_img_subprocess(img, convert_binary)
                hocr_path = make_hocr_from_img(img, tesseract_binary, lang)
                with open(hocr_path, encoding="utf-8") as f:
                    spans = hocr.parse_hocr_page(
                        f.read(), 1, geom["height_pt"], geom["output_dpi"]
                    )
                pages.append(hocr.page_text_from_spans(spans))
            except SubprocessKernelError:
                return ([], "ocr_error")
        return (pages, "ok")
