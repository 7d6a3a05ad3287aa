"""Build the `--py-files` distribution zip for cluster submission.

    python tools/package.py [out_dir]   # default: dist/

Produces `osm_pbf2json_spark.zip` containing the engine package only
(no tests, no tools). The archive is BYTE-REPRODUCIBLE: entries are
added in sorted order with a fixed timestamp and permission bits, so
the same source tree always yields the same zip — which lets lineage
manifests (plans/lineage.py) record a stable code fingerprint per run
and makes "which code produced this partition?" answerable at 100-TB
scale.

Cluster usage (north rule: jobs run via spark-submit --py-files):

    spark-submit --py-files dist/osm_pbf2json_spark.zip \
        tools/submit_cli.py <table_dir_or_pbf> objects -t 'amenity~cafe'
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile

_FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # reproducible builds


def build_zip(out_dir: str = "dist") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "osm_pbf2json_spark")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "osm_pbf2json_spark.zip")

    files = []
    for root, _dirs, names in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for n in names:
            if n.endswith(".py"):
                p = os.path.join(root, n)
                files.append((os.path.relpath(p, repo), p))
    files.sort()

    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, path in files:
            info = zipfile.ZipInfo(arcname, date_time=_FIXED_DATE)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(path, "rb") as f:
                zf.writestr(info, f.read())
    return out


def zip_fingerprint(zip_path: str) -> str:
    """sha256 of the reproducible archive = code fingerprint for
    lineage manifests."""
    h = hashlib.sha256()
    with open(zip_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


if __name__ == "__main__":
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(out)
    print("sha256:", zip_fingerprint(out))
