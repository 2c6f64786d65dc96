"""Package shipping — the `spark-submit --py-files` story.

On a real cluster the engine is submitted as
``spark-submit --py-files lbf_spark.zip job.py``; when a session is
built programmatically (notebooks, tests, this sandbox) we do the same
thing mechanically: zip the package and ``addPyFile`` it so every
executor can unpickle our UDFs regardless of its working directory.
The zip is content-addressed so repeated sessions reuse it.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    """Zip the lbf_spark package; returns the zip path (content-hashed)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.join(
                    "lbf_spark", os.path.relpath(full, pkg_dir)
                )
                entries.append((rel, full))
    h = hashlib.sha1()
    for rel, full in sorted(entries):
        h.update(rel.encode())
        with open(full, "rb") as fh:
            h.update(fh.read())
    dest_dir = dest_dir or tempfile.gettempdir()
    path = os.path.join(dest_dir, f"lbf_spark-{h.hexdigest()[:12]}.zip")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for rel, full in sorted(entries):
                zf.write(full, rel)
        os.replace(tmp, path)
    return path


def ship_package(spark) -> str:
    """Attach the package zip to a live session (addPyFile)."""
    path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(path)
    return path
