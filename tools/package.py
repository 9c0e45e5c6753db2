"""Build the --py-files archive for spark-submit deployment.

    python tools/package.py [out.zip]      # default: dist/etl_spark.zip

Cluster invocation (north_rule's deployment shape):

    spark-submit --master <cluster> --py-files dist/etl_spark.zip \
        tools/submit_replay.py --stream <dir> --table <dir> --mode catchup
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "etl_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "etl_spark.zip")
    print(build(out))
