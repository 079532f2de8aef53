#!/usr/bin/env bash
# Optional real-codec lane (VERDICT r11 #5).
#
# The repo's PDF-decode (S2/C1), image/audio feature (multimodal), and
# sentence-transformer embedding (E1) operators each have TWO legs: a
# deterministic stub leg (what CI and the 347-query registry exercise)
# and a real-codec leg gated on the optional library being importable
# (sources/pdf.py:194, functions/embedding.py:82, multimodal/decode.py).
#
# THIS container cannot run the real legs: the build environment
# forbids package installation (no pip/apt; tools/REAL_CODEC_LANE.md
# records the r12 attempt), so tests/test_real_codec_legs.py
# importorskips — the documented impossibility. Run this script in any
# environment that allows installs to execute the real legs once and
# record the artifact:
#
#   bash tools/real_codec_lane.sh [artifact.json]
#
# It installs the three optional libraries, runs the env-gated tests
# plus the E1 real-encoder smoke, and writes a JSON artifact with the
# pytest summary — the evidence VERDICT r11 #5 asks for.

set -euo pipefail
ARTIFACT="${1:-real_codec_lane.json}"
cd "$(dirname "$0")/.."

python -m pip install --quiet pymupdf Pillow sentence-transformers

python -m pytest tests/test_real_codec_legs.py -v --tb=short \
    2>&1 | tee /tmp/real_codec_pytest.log
PYTEST_TAIL=$(tail -1 /tmp/real_codec_pytest.log)

# E1 real-encoder smoke: the declared embedding operator must produce
# model vectors (not the hash-embedder stub) when the library exists.
python - <<'EOF'
from data_engineering_1_spark.session import get_spark
from data_engineering_1_spark.functions.embedding import (
    sentence_transformer_embedder,
)

spark = get_spark("real-codec-lane")
df = spark.createDataFrame(
    [(1, "hello world"), (2, "guten tag")], "id long, text string"
)
emb = sentence_transformer_embedder()
out = df.select("id", emb("text").alias("embedding")).collect()
assert len(out) == 2 and len(out[0]["embedding"]) > 0
print("E1 real-encoder smoke ok:", len(out[0]["embedding"]), "dims")
EOF

python - "$ARTIFACT" "$PYTEST_TAIL" <<'EOF'
import json, sys, datetime
json.dump(
    {
        "lane": "real-codec",
        "pytest_tail": sys.argv[2],
        "ran_at": datetime.datetime.now().isoformat(),
    },
    open(sys.argv[1], "w"),
    indent=1,
)
print("wrote", sys.argv[1])
EOF
