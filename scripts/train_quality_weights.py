"""Train data/quality_weights.parquet — a REALLY-trained hashed-linear
quality model for operators/curation.classifier_scores.

The classifier was designed weights-as-data (the scoring path only sees
a (bucket, w_milli) dimension); until now that dimension was a synthetic
closed form. This script replaces it with weights trained the way
production pipelines actually bootstrap quality classifiers: distill the
heuristic gate into a linear model (fastText-style hashed unigram+bigram
features, logistic regression), so the model generalizes the rule bundle
into a single score.

- Labels: the repo's own Gopher rule bundle (word-count band, mean word
  length band, alpha-word fraction, stopword floor — the same constants
  as queries/curation_queries.q_gopher_quality_gate), computed in pure
  Python over the sf0.01 fixture corpus.
- Features: md5-bucketed unigrams + bigrams, the EXACT closed form of
  operators/curation.gram_features/feature_bucket (65536 buckets).
- Training: full-batch logistic regression, zero init, fixed epochs —
  fully deterministic, no RNG.
- Output: one row per bucket (unseen buckets carry weight 0, so the
  scorer's inner join keeps its n_feats semantics) PLUS the trained
  intercept under the reserved bucket -1 (a real feature bucket is in
  [0, 2^16), so the row is inert in the feature join and the scorer
  reads it as model metadata). w_milli = round(w * scale * 1000) int64
  for engine-exact integer scoring; keep = z_milli > 0 with z
  INCLUDING the intercept. The intercept is what lets a linear count
  model express the Gopher word-count floor at all — without it,
  z grows monotonically with document length and never crosses zero.

Usage: python scripts/train_quality_weights.py \
           [/root/testdata/sf0.01/documents.parquet] [out.parquet]
"""

from __future__ import annotations

import hashlib
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
DEFAULT_SRC = "/root/testdata/sf0.01/documents.parquet"
DEFAULT_OUT = REPO / "data" / "quality_weights.parquet"

N_BUCKETS = 1 << 16  # = operators/curation.N_FEATURE_BUCKETS

# = queries/curation_queries GOPHER_* constants
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_WLEN, MAX_WLEN = 3.0, 10.0
MIN_ALPHA = 0.8
MIN_STOPWORDS = 2


def gopher_label(text: str) -> int:
    words = [w for w in re.split(r"\s+", text.strip()) if w]
    n = len(words)
    if n == 0:
        return 0
    mean_wlen = round(len(re.sub(r"\s", "", text)) / n, 4)
    alpha = len(re.findall(r"\b[a-zA-Z]+\b", text))
    stop = len(re.findall(r"\b(?:the|a|of|and|to)\b", text))
    return int(
        MIN_WORDS <= n <= MAX_WORDS
        and MIN_WLEN <= mean_wlen <= MAX_WLEN
        and round(alpha / n, 4) >= MIN_ALPHA
        and stop >= MIN_STOPWORDS
    )


def feature_buckets(text: str) -> list[int]:
    """Hashed unigram+bigram buckets — the exact Spark/DuckDB closed
    form (md5 first 8 hex chars mod 2^16)."""
    words = re.split(r"\s+", text.strip())
    grams = words + [
        f"{a} {b}" for a, b in zip(words, words[1:])
    ]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS
        for g in grams
    ]


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUT

    tbl = pq.read_table(src, columns=["doc_id", "text"])
    texts = tbl["text"].to_pylist()
    y = np.array([gopher_label(t) for t in texts], dtype=np.float64)
    rows = [feature_buckets(t) for t in texts]

    # Count-feature design matrix, CSR-style by hand (no scipy dep).
    n_docs = len(texts)
    w = np.zeros(N_BUCKETS)
    w0 = 0.0  # intercept
    lr, l2, epochs = 0.05, 1e-4, 400
    idx = [np.array(r, dtype=np.int64) for r in rows]
    counts = [
        np.unique(r, return_counts=True) for r in idx
    ]
    for _ in range(epochs):
        grad = l2 * w
        grad0 = 0.0
        for i in range(n_docs):
            b, c = counts[i]
            z = float(np.dot(w[b], c)) + w0
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y[i]
            grad[b] += g * c / n_docs
            grad0 += g / n_docs
        w -= lr * grad
        w0 -= lr * grad0

    # The decision rule z > 0 is scale-invariant, so normalize before
    # integer quantization (max |w| -> 5000 milli) to minimize rounding
    # loss instead of shipping near-zero millis.
    scale = 5.0 / max(float(np.abs(w).max()), abs(w0), 1e-12)
    w_milli = np.rint(w * scale * 1000.0).astype(np.int64)
    w0_milli = int(np.rint(w0 * scale * 1000.0))

    # Diagnostics on the SHIPPED (quantized) model, deterministic.
    correct = 0
    for i in range(n_docs):
        b, c = counts[i]
        z = int(np.dot(w_milli[b], c)) + w0_milli
        correct += int((z > 0) == bool(y[i]))
    acc = correct / n_docs
    out.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "bucket": pa.array(
                    [-1, *range(N_BUCKETS)], pa.int64()
                ),
                "w_milli": pa.array(
                    [w0_milli, *w_milli.tolist()], pa.int64()
                ),
            }
        ),
        out,
        compression="zstd",
    )
    nz = int((w_milli != 0).sum())
    print(
        f"wrote {out}: {N_BUCKETS} buckets ({nz} non-zero) + intercept "
        f"{w0_milli} milli, train acc {acc:.3f} on {n_docs} docs "
        f"(pos rate {y.mean():.3f})"
    )


if __name__ == "__main__":
    main()
