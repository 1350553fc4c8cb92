"""Dependency-free SVG EDA report — the reference notebook's plot set
(notebooks/01_exploratory_data_analysis.py:85-260) rebuilt Spark-first.

The reference calls ``.toPandas()`` on RAW columns and hands them to
matplotlib/seaborn — a driver funnel that dies long before 100 TB.
Here every figure is computed as a DISTRIBUTED aggregate first
(width_bucket histograms, groupBy bars, 2-D binned density instead of
raw scatter, ``pyspark.ml.stat.Correlation`` for the matrix) and only
the plot-ready aggregate — never the data — reaches the driver, where
a ~kilobyte SVG is written with plain string templates. No matplotlib,
no seaborn, no numpy needed to render.

Design follows the repo's chart method: single-series marks in one
blue (#2a78d6, validated palette slot 1); sequential magnitude uses
the one-hue blue ramp; the correlation heatmap uses the blue↔red
diverging pair with a neutral gray midpoint and every cell annotated
(the relief rule: values visible, not color-alone); grid/axis ink is
recessive; text wears text tokens, never series color; native SVG
``<title>`` elements give every mark a hover tooltip.
"""

from __future__ import annotations

import math
import os
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#eceae6"
SERIES = "#2a78d6"
SEQ_RAMP = [  # blue 100 -> 700 (light -> dark = small -> large)
    "#cde2fb", "#b7d3f6", "#9ec5f4", "#86b6ef", "#6da7ec", "#5598e7",
    "#3987e5", "#2a78d6", "#256abf", "#1c5cab", "#184f95", "#104281", "#0d366b",
]
DIV_NEG, DIV_MID, DIV_POS = "#1c5cab", "#f0efec", "#b23434"  # blue <- gray -> red

W, H = 640, 400
ML, MR, MT, MB = 70, 20, 44, 92  # margins (bottom fits rotated labels)


def _lerp_hex(c1: str, c2: str, t: float) -> str:
    a = [int(c1[i : i + 2], 16) for i in (1, 3, 5)]
    b = [int(c2[i : i + 2], 16) for i in (1, 3, 5)]
    return "#" + "".join(f"{round(x + (y - x) * t):02x}" for x, y in zip(a, b))


def seq_color(t: float) -> str:
    """Sequential ramp lookup, t in [0, 1] (0 = near zero = lightest)."""
    t = min(max(t, 0.0), 1.0)
    return SEQ_RAMP[round(t * (len(SEQ_RAMP) - 1))]


def div_color(v: float) -> str:
    """Diverging lookup, v in [-1, 1]; gray at 0."""
    v = min(max(v, -1.0), 1.0)
    return _lerp_hex(DIV_MID, DIV_NEG, -v) if v < 0 else _lerp_hex(DIV_MID, DIV_POS, v)


def _svg(children: list[str], title: str, width: int = W, height: int = H) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'width="{width}" height="{height}" font-family="sans-serif">\n'
        f'<rect width="{width}" height="{height}" fill="{SURFACE}"/>\n'
        f'<text x="{width / 2}" y="24" text-anchor="middle" font-size="15" '
        f'fill="{INK}">{escape(title)}</text>\n' + "\n".join(children) + "\n</svg>\n"
    )


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return f"{int(v):,}"
    return f"{v:,.2f}"


def _y_ticks(vmax: float, plot_h: float):
    """4 recessive gridlines + labels for a 0..vmax axis."""
    out = []
    for i in range(1, 5):
        v = vmax * i / 4
        y = MT + plot_h * (1 - i / 4)
        out.append(f'<line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}" stroke="{GRID}"/>')
        out.append(
            f'<text x="{ML - 6}" y="{y + 4:.1f}" text-anchor="end" font-size="10" '
            f'fill="{INK_2}">{escape(_fmt(v))}</text>'
        )
    return out


def bar_svg(pairs: list[tuple[str, float]], title: str, y_label: str = "") -> str:
    """Vertical bar chart: one series, one blue, 2px gaps, rounded data
    ends, selective direct labels (max + min only), hover titles."""
    vmax = max((v for _, v in pairs), default=0) or 1
    plot_w, plot_h = W - ML - MR, H - MT - MB
    n = max(len(pairs), 1)
    bw = max(plot_w / n - 2, 1)  # 2px surface gap between bars
    parts = _y_ticks(vmax, plot_h)
    parts.append(f'<line x1="{ML}" y1="{H - MB}" x2="{W - MR}" y2="{H - MB}" stroke="{INK_2}"/>')
    hi = max(range(len(pairs)), key=lambda i: pairs[i][1], default=0)
    lo = min(range(len(pairs)), key=lambda i: pairs[i][1], default=0)
    for i, (label, v) in enumerate(pairs):
        x = ML + i * (plot_w / n) + 1
        bh = plot_h * (v / vmax)
        y = H - MB - bh
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" height="{bh:.1f}" '
            f'rx="2" fill="{SERIES}"><title>{escape(label)}: {escape(_fmt(v))}</title></rect>'
        )
        if i in (hi, lo) and len(pairs) > 1:
            parts.append(
                f'<text x="{x + bw / 2:.1f}" y="{y - 4:.1f}" text-anchor="middle" '
                f'font-size="10" fill="{INK}">{escape(_fmt(v))}</text>'
            )
        cx = x + bw / 2
        parts.append(
            f'<text x="{cx:.1f}" y="{H - MB + 12}" text-anchor="end" font-size="10" '
            f'fill="{INK_2}" transform="rotate(-35 {cx:.1f} {H - MB + 12})">{escape(str(label))}</text>'
        )
    if y_label:
        parts.append(
            f'<text x="16" y="{MT + plot_h / 2}" font-size="11" fill="{INK_2}" '
            f'text-anchor="middle" transform="rotate(-90 16 {MT + plot_h / 2})">{escape(y_label)}</text>'
        )
    return _svg(parts, title)


def histogram_svg(edges: list[float], counts: list[int], title: str, x_label: str = "") -> str:
    """Histogram from precomputed bins (the distributed width_bucket
    aggregate) — bars touch except the 2px surface gap."""
    vmax = max(counts, default=0) or 1
    plot_w, plot_h = W - ML - MR, H - MT - MB
    n = max(len(counts), 1)
    parts = _y_ticks(vmax, plot_h)
    parts.append(f'<line x1="{ML}" y1="{H - MB}" x2="{W - MR}" y2="{H - MB}" stroke="{INK_2}"/>')
    for i, c in enumerate(counts):
        x = ML + i * (plot_w / n) + 1
        bh = plot_h * (c / vmax)
        parts.append(
            f'<rect x="{x:.1f}" y="{H - MB - bh:.1f}" width="{max(plot_w / n - 2, 1):.1f}" '
            f'height="{bh:.1f}" fill="{SERIES}">'
            f"<title>[{_fmt(edges[i])}, {_fmt(edges[i + 1])}): {c:,}</title></rect>"
        )
    for i in range(0, n + 1, max(n // 8, 1)):
        x = ML + i * (plot_w / n)
        parts.append(
            f'<text x="{x:.1f}" y="{H - MB + 14}" text-anchor="middle" font-size="9" '
            f'fill="{INK_2}">{escape(_fmt(edges[i]))}</text>'
        )
    if x_label:
        parts.append(
            f'<text x="{(ML + W - MR) / 2}" y="{H - MB + 34}" text-anchor="middle" '
            f'font-size="11" fill="{INK_2}">{escape(x_label)}</text>'
        )
    return _svg(parts, title)


def heatmap_svg(labels: list[str], matrix: list[list[float]], title: str) -> str:
    """Annotated correlation heatmap — diverging blue↔red around a
    gray midpoint, every cell annotated (relief: never color-alone)."""
    n = len(labels)
    side = min((W - ML - MR) / max(n, 1), (H - MT - MB + 40) / max(n, 1))
    parts = []
    for i in range(n):
        for j in range(n):
            v = matrix[i][j]
            x, y = ML + j * side, MT + i * side
            ink = "#ffffff" if abs(v) > 0.65 else INK
            parts.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{side - 1:.1f}" height="{side - 1:.1f}" '
                f'fill="{div_color(v)}"><title>{escape(labels[i])} × {escape(labels[j])}: {v:.2f}</title></rect>'
            )
            parts.append(
                f'<text x="{x + side / 2:.1f}" y="{y + side / 2 + 3:.1f}" text-anchor="middle" '
                f'font-size="{max(min(side / 4, 10), 6):.0f}" fill="{ink}">{v:.2f}</text>'
            )
    for i, lab in enumerate(labels):
        parts.append(
            f'<text x="{ML - 5}" y="{MT + i * side + side / 2 + 3:.1f}" text-anchor="end" '
            f'font-size="9" fill="{INK_2}">{escape(lab)}</text>'
        )
        cx = ML + i * side + side / 2
        yb = MT + n * side + 10
        parts.append(
            f'<text x="{cx:.1f}" y="{yb:.1f}" text-anchor="end" font-size="9" fill="{INK_2}" '
            f'transform="rotate(-45 {cx:.1f} {yb:.1f})">{escape(lab)}</text>'
        )
    return _svg(parts, title, height=max(H, int(MT + len(labels) * side + 90)))


def density_svg(
    x_edges: list[float],
    y_edges: list[float],
    cells: dict[tuple[int, int], float],
    title: str,
    x_label: str = "",
    y_label: str = "",
) -> str:
    """2-D binned density/intensity map — the scale-safe replacement
    for a raw scatter plot: sequential one-hue ramp, light = sparse."""
    nx, ny = len(x_edges) - 1, len(y_edges) - 1
    vmax = max(cells.values(), default=0) or 1
    plot_w, plot_h = W - ML - MR, H - MT - MB
    cw, ch = plot_w / max(nx, 1), plot_h / max(ny, 1)
    parts = [f'<rect x="{ML}" y="{MT}" width="{plot_w}" height="{plot_h}" fill="{SEQ_RAMP[0]}" opacity="0.35"/>']
    for (i, j), v in sorted(cells.items()):
        x = ML + i * cw
        y = H - MB - (j + 1) * ch
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{cw + 0.5:.1f}" height="{ch + 0.5:.1f}" '
            f'fill="{seq_color(v / vmax)}">'
            f"<title>x∈[{_fmt(x_edges[i])},{_fmt(x_edges[i + 1])}) "
            f"y∈[{_fmt(y_edges[j])},{_fmt(y_edges[j + 1])}): {escape(_fmt(v))}</title></rect>"
        )
    for i in range(0, nx + 1, max(nx // 6, 1)):
        parts.append(
            f'<text x="{ML + i * cw:.1f}" y="{H - MB + 14}" text-anchor="middle" font-size="9" '
            f'fill="{INK_2}">{escape(_fmt(x_edges[i]))}</text>'
        )
    for j in range(0, ny + 1, max(ny // 5, 1)):
        parts.append(
            f'<text x="{ML - 6}" y="{H - MB - j * ch + 3:.1f}" text-anchor="end" font-size="9" '
            f'fill="{INK_2}">{escape(_fmt(y_edges[j]))}</text>'
        )
    if x_label:
        parts.append(
            f'<text x="{(ML + W - MR) / 2}" y="{H - MB + 34}" text-anchor="middle" font-size="11" '
            f'fill="{INK_2}">{escape(x_label)}</text>'
        )
    if y_label:
        parts.append(
            f'<text x="16" y="{MT + plot_h / 2}" font-size="11" fill="{INK_2}" text-anchor="middle" '
            f'transform="rotate(-90 16 {MT + plot_h / 2})">{escape(y_label)}</text>'
        )
    return _svg(parts, title)


# --- distributed aggregate -> figure helpers --------------------------------


def _bucketize(df: DataFrame, col: str, bins: int = 50):
    """One min/max job + one width_bucket groupBy → (edges, counts)."""
    r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = float(r["lo"]), float(r["hi"])
    if hi <= lo:
        hi = lo + 1.0
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.least(
                F.lit(bins), F.greatest(F.lit(1), F.width_bucket(F.col(col), F.lit(lo), F.lit(hi), F.lit(bins)))
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_b = {int(r["b"]): int(r["c"]) for r in rows}
    edges = [lo + (hi - lo) * i / bins for i in range(bins + 1)]
    return edges, [by_b.get(i + 1, 0) for i in range(bins)]


def _bucketize_2d(df: DataFrame, xcol: str, ycol: str, agg, nx: int = 40, ny: int = 30, vcol: str | None = None):
    """2-D binned aggregate — the distributed scatter: one bounds job +
    one groupBy. ``agg`` runs over the cell's rows; reference the
    value column as ``_v`` (defaults to ``ycol``)."""
    r = df.agg(
        F.min(xcol).alias("xlo"), F.max(xcol).alias("xhi"),
        F.min(ycol).alias("ylo"), F.max(ycol).alias("yhi"),
    ).first()
    xlo, xhi = float(r["xlo"]), float(r["xhi"])
    ylo, yhi = float(r["ylo"]), float(r["yhi"])
    if xhi <= xlo:
        xhi = xlo + 1.0
    if yhi <= ylo:
        yhi = ylo + 1.0
    rows = (
        df.filter(F.col(xcol).isNotNull() & F.col(ycol).isNotNull())
        .select(
            F.least(F.lit(nx - 1), F.floor((F.col(xcol) - xlo) / (xhi - xlo) * nx)).cast("int").alias("i"),
            F.least(F.lit(ny - 1), F.floor((F.col(ycol) - ylo) / (yhi - ylo) * ny)).cast("int").alias("j"),
            F.col(vcol or ycol).alias("_v"),
        )
        .groupBy("i", "j")
        .agg(agg.alias("v"))
        .collect()
    )
    x_edges = [xlo + (xhi - xlo) * i / nx for i in range(nx + 1)]
    y_edges = [ylo + (yhi - ylo) * j / ny for j in range(ny + 1)]
    return x_edges, y_edges, {(int(r["i"]), int(r["j"])): float(r["v"]) for r in rows}


EDA_CATEGORICALS = ["property_type", "energy_performance_category", "ghg_category", "exposition"]
EDA_NUMERICS = ["size", "floor", "land_size", "nb_rooms", "nb_bedrooms", "nb_photos"]


def eda_report(df: DataFrame, out_dir: str) -> list[str]:
    """The reference notebook's EDA figure set, distributed: missing-%
    bars, price histograms (linear + log10), per-categorical count and
    avg-price bars, per-numeric histogram + price-relation density,
    geographic density, correlation heatmap. ``df`` must carry the
    listings columns + ``price``. Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def emit(name: str, svg: str) -> None:
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write(svg)
        written.append(path)

    # 1. missing values (ONE aggregate pass, not a count() per column)
    n = df.count()
    aggs = [F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c) for c in df.columns]
    row = df.agg(*aggs).first().asDict()
    miss = sorted(((c, 100.0 * v / n) for c, v in row.items() if v), key=lambda t: -t[1])
    emit("missing_values.svg", bar_svg(miss, "Missing values by column", "% missing"))

    # 2. price distribution, linear + log10
    edges, counts = _bucketize(df, "price")
    emit("price_distribution.svg", histogram_svg(edges, counts, "Price distribution", "price (EUR)"))
    logp = df.filter(F.col("price") > 0).select(F.log10("price").alias("lp"))
    edges, counts = _bucketize(logp, "lp")
    emit(
        "price_distribution_log.svg",
        histogram_svg(edges, counts, "Price distribution (log10 scale)", "log10 price"),
    )

    # 3. categoricals: count + avg price per value
    for c in (c for c in EDA_CATEGORICALS if c in df.columns):
        cdf = df.withColumn(c, F.coalesce(F.col(c), F.lit("Unknown")))
        rows = cdf.groupBy(c).agg(F.count(F.lit(1)).alias("n"), F.avg("price").alias("p")).collect()
        rows.sort(key=lambda r: -r["n"])
        emit(f"distribution_{c}.svg", bar_svg([(r[c], r["n"]) for r in rows], f"Distribution of {c}"))
        rows.sort(key=lambda r: -r["p"])
        emit(
            f"avg_price_by_{c}.svg",
            bar_svg([(r[c], round(r["p"], 2)) for r in rows], f"Average price by {c}", "avg price (EUR)"),
        )

    # 4. numerics: histogram + binned price relation (scatter, scale-safe)
    for c in (c for c in EDA_NUMERICS if c in df.columns):
        edges, counts = _bucketize(df.filter(F.col(c).isNotNull()), c)
        emit(f"distribution_{c}.svg", histogram_svg(edges, counts, f"Distribution of {c}", c))
        xe, ye, cells = _bucketize_2d(df, c, "price", F.count(F.lit(1)))
        emit(
            f"analysis_{c}.svg",
            density_svg(xe, ye, cells, f"{c} vs price (binned density)", c, "price (EUR)"),
        )

    # 5. geographic map, cells colored by average price (the reference's
    # price-colored scatter, binned so no raw rows reach the driver)
    if "approximate_longitude" in df.columns:
        xe, ye, cells = _bucketize_2d(
            df, "approximate_longitude", "approximate_latitude", F.avg("_v"), vcol="price"
        )
        emit(
            "geographic_distribution.svg",
            density_svg(
                xe, ye, {k: round(v, 2) for k, v in cells.items()},
                "Geography: average price per cell", "longitude", "latitude",
            ),
        )

    # 6. correlation matrix (distributed, one job)
    num_cols = ["price"] + [c for c in EDA_NUMERICS if c in df.columns]
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    vec = VectorAssembler(inputCols=num_cols, outputCol="_v", handleInvalid="skip").transform(
        df.select(*num_cols)
    )
    m = Correlation.corr(vec, "_v").first()[0].toArray()
    matrix = [[0.0 if math.isnan(v) else float(v) for v in rowv] for rowv in m]
    emit("correlation_matrix.svg", heatmap_svg(num_cols, matrix, "Correlation matrix"))
    return written
