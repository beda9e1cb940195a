"""Render the reference's two report charts as dependency-free SVG.

The reference ships two matplotlib images (README.md:39 kmeans.png --
the SSE-vs-k elbow curve -- and README.md:150 test_rmse.png -- a bar
chart comparing the cluster-average predictor's and ALS's test RMSE).
This container has no matplotlib, so the charts are emitted as
hand-built SVG: same data, same story, zero dependencies.

Data comes from the MovieLens-1M-SHAPED twin at the bench
configuration (3,706 movies / 6,040 users / ~1M ratings -- the same
inputs ml_movielens_report and tests/test_ml_band.py use), so the
elbow matches the golden-band test's pinned k.

Usage: python tools/make_charts.py  -> charts/kmeans_elbow.svg,
charts/test_rmse.svg
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 640, 420
ML, MR, MT, MB = 70, 20, 40, 55  # margins
PW, PH = W - ML - MR, H - MT - MB


def _header(title: str) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="sans-serif">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{W / 2}" y="24" text-anchor="middle" font-size="16" '
        f'font-weight="bold">{title}</text>',
    ]


def _axes(xlab: str, ylab: str) -> list[str]:
    return [
        f'<line x1="{ML}" y1="{MT}" x2="{ML}" y2="{H - MB}" '
        f'stroke="black"/>',
        f'<line x1="{ML}" y1="{H - MB}" x2="{W - MR}" y2="{H - MB}" '
        f'stroke="black"/>',
        f'<text x="{ML + PW / 2}" y="{H - 12}" text-anchor="middle" '
        f'font-size="13">{xlab}</text>',
        f'<text x="18" y="{MT + PH / 2}" text-anchor="middle" '
        f'font-size="13" transform="rotate(-90 18 {MT + PH / 2})">'
        f'{ylab}</text>',
    ]


def elbow_svg(sse: dict[int, float], best_k: int, path: str) -> None:
    ks = sorted(sse)
    lo, hi = min(sse.values()), max(sse.values())
    pad = 0.08 * (hi - lo)
    lo, hi = lo - pad, hi + pad

    def x(k):
        return ML + PW * (k - ks[0]) / (ks[-1] - ks[0])

    def y(v):
        return MT + PH * (hi - v) / (hi - lo)

    out = _header("KMeans elbow: SSE vs k (MovieLens-1M twin, seed 823)")
    out += _axes("k (number of clusters)", "SSE (trainingCost)")
    pts = " ".join(f"{x(k):.1f},{y(sse[k]):.1f}" for k in ks)
    out.append(f'<polyline points="{pts}" fill="none" stroke="#1f77b4" '
               f'stroke-width="2"/>')
    for k in ks:
        out.append(f'<circle cx="{x(k):.1f}" cy="{y(sse[k]):.1f}" r="4" '
                   f'fill="#1f77b4"/>')
        out.append(f'<text x="{x(k):.1f}" y="{H - MB + 18}" '
                   f'text-anchor="middle" font-size="11">{k}</text>')
        out.append(f'<text x="{x(k):.1f}" y="{y(sse[k]) - 10:.1f}" '
                   f'text-anchor="middle" font-size="10">'
                   f'{sse[k]:.0f}</text>')
    out.append(f'<circle cx="{x(best_k):.1f}" cy="{y(sse[best_k]):.1f}" '
               f'r="8" fill="none" stroke="#d62728" stroke-width="2"/>')
    out.append(f'<text x="{x(best_k):.1f}" y="{y(sse[best_k]) + 26:.1f}" '
               f'text-anchor="middle" font-size="12" fill="#d62728">'
               f'elbow k={best_k}</text>')
    out.append("</svg>")
    open(path, "w").write("\n".join(out))


def rmse_bars_svg(bars: list[tuple[str, float]], path: str) -> None:
    hi = max(v for _, v in bars) * 1.15
    bw = PW / (2 * len(bars))
    out = _header("Test RMSE: cluster-average predictor vs ALS "
                  "(MovieLens-1M twin)")
    out += _axes("model", "test RMSE")
    for i, (name, v) in enumerate(bars):
        cx = ML + PW * (2 * i + 1) / (2 * len(bars))
        bh = PH * v / hi
        out.append(f'<rect x="{cx - bw / 2:.1f}" y="{H - MB - bh:.1f}" '
                   f'width="{bw:.1f}" height="{bh:.1f}" '
                   f'fill="{"#1f77b4" if i else "#ff7f0e"}"/>')
        out.append(f'<text x="{cx:.1f}" y="{H - MB - bh - 8:.1f}" '
                   f'text-anchor="middle" font-size="12">{v:.4f}</text>')
        out.append(f'<text x="{cx:.1f}" y="{H - MB + 18}" '
                   f'text-anchor="middle" font-size="12">{name}</text>')
    out.append("</svg>")
    open(path, "w").write("\n".join(out))


def main() -> None:
    from pyspark.ml.feature import VectorAssembler

    from recommendation_system_spark_ml_spark.ml.parity import (
        elbow_best_k, kmeans_sweep)
    from recommendation_system_spark_ml_spark.registry import all_specs
    from recommendation_system_spark_ml_spark.session import (
        get_spark, pin_session_conf)
    from recommendation_system_spark_ml_spark.sources.text import (
        generate_movielens_twin, genre_onehot, parse_movies)

    spark = get_spark(app_name="make-charts")
    pin_session_conf(spark)
    scratch = os.path.join(tempfile.gettempdir(),
                           "spark_graft_movielens_sf0.1")
    movies_path, _ = generate_movielens_twin(
        spark, scratch, n_movies=3706, n_users=6040, ratings_per_user=166)
    onehot = genre_onehot(parse_movies(spark.read.text(movies_path)))
    gcols = [c for c in onehot.columns if c != "movieId"]
    feats = (VectorAssembler(inputCols=gcols, outputCol="features")
             .transform(onehot).repartition(8, "movieId")
             .sortWithinPartitions("movieId").cache())
    sse = dict(kmeans_sweep(feats))
    feats.unpersist()
    best_k = elbow_best_k(sse)

    report = {r.metric: r.value
              for r in all_specs()["ml_movielens_report"]
              .fn(spark, "/root/testdata/sf0.1").collect()}

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "charts")
    os.makedirs(out_dir, exist_ok=True)
    elbow_svg(sse, best_k, os.path.join(out_dir, "kmeans_elbow.svg"))
    rmse_bars_svg(
        [("cluster-average predictor", report["kmeans_test_rmse"]),
         ("ALS (rank 10, reg 0.05)", report["als_test_rmse"])],
        os.path.join(out_dir, "test_rmse.svg"))
    print(f"wrote {out_dir}/kmeans_elbow.svg and test_rmse.svg "
          f"(elbow k={best_k})")


if __name__ == "__main__":
    main()
