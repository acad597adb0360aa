#!/usr/bin/env python
"""spark-submit application file for the extraction job.

This file is intentionally a shim: it carries no logic and imports the
whole engine from the ``--py-files pypdfocr_spark.zip`` archive — the
launch shape the north rule prescribes (``spark-submit --py-files`` on a
multi-executor cluster). It is copied to a neutral working directory by
``scripts/submit_bench.py`` so the repo checkout cannot shadow the zip;
the PKG_SOURCE line printed to stderr is the provenance proof (it must
point inside the zip, not at a filesystem package).

Usage (what submit_bench.py runs):

    spark-submit --master local[N] --py-files /tmp/.../pypdfocr_spark.zip \
        submit_entry.py --corpus /tmp/corpus --out /tmp/out [--resume] \
        --master local[N]
"""

import sys


def main() -> int:
    import pypdfocr_spark

    print(f"PKG_SOURCE={pypdfocr_spark.__file__}", file=sys.stderr, flush=True)
    from pypdfocr_spark import cli

    return cli.main(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
