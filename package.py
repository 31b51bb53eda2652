#!/usr/bin/env python
"""Build dist/ecommerce_lakehouse_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
PKG = "ecommerce_lakehouse_spark"


def main() -> str:
    os.makedirs(os.path.join(HERE, "dist"), exist_ok=True)
    out = os.path.join(HERE, "dist", f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(HERE, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, HERE))
    print(out)
    return out


if __name__ == "__main__":
    main()
