#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pandasschema_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/pandasschema_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("pandasschema_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/pandasschema_spark.zip")
EOF
