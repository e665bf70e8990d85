"""Package the engine for spark-submit --py-files.

    python tools/make_pyfiles_zip.py        # -> dist/distributed_lsh_spark.zip

    spark-submit --py-files dist/distributed_lsh_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        your_job.py
or run the bundled CLI directly:
    spark-submit --py-files dist/distributed_lsh_spark.zip \\
        $(python -c 'import distributed_lsh_spark.cli as c; print(c.__file__)') \\
        dedup --input /data/pages --output /runs/r1
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "distributed_lsh_spark.zip")
    pkg = os.path.join(ROOT, "distributed_lsh_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
