"""Report visualizations (optional extra).

Reference: reports/graphs.py:31-358 — plot_histograms (per numeric
column), plot_col_histogram, plot_missing_values_matrix. Driver-side
matplotlib over profile state when matplotlib is installed (the
reference's optional [reports] extra); otherwise a dependency-free SVG
backend renders the same three figures, so report graphs work (and are
testable) in minimal environments.

SVG styling: one sequential hue for magnitude bars (no legend — single
series), neutral-ink text, recessive gridlines, 2px gaps between bars,
rounded data-ends anchored at the baseline.
"""

from __future__ import annotations

import html

from dataprofiler_spark.state import DatasetState

# Brand-neutral default tokens (swap for a house palette if embedding).
_SERIES = "#2a78d6"       # sequential hue — magnitude
_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"          # primary text
_INK2 = "#52514e"         # secondary text (axis labels)
_GRID = "#e7e6e2"         # recessive gridlines


def _require_matplotlib():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError as e:
        raise ImportError(
            "matplotlib is required for backend='matplotlib' (reference "
            "ships this as the optional [reports] extra); use "
            "backend='svg' for the dependency-free renderer") from e


def _pick_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    try:
        import matplotlib  # noqa: F401
        return "matplotlib"
    except ImportError:
        return "svg"


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return f"{v:.4g}"


def _bar_path(x: float, y: float, w: float, h: float, r: float = 4) -> str:
    """Vertical bar with rounded top data-end, flat baseline anchor."""
    r = min(r, w / 2, h)
    if r <= 0.5:
        return (f'<rect x="{x:.2f}" y="{y:.2f}" width="{w:.2f}" '
                f'height="{h:.2f}" fill="{_SERIES}"/>')
    return (f'<path d="M{x:.2f},{y + h:.2f} V{y + r:.2f} '
            f'Q{x:.2f},{y:.2f} {x + r:.2f},{y:.2f} H{x + w - r:.2f} '
            f'Q{x + w:.2f},{y:.2f} {x + w:.2f},{y + r:.2f} V{y + h:.2f} Z" '
            f'fill="{_SERIES}"/>')


def _svg_histogram_group(edges, counts, title: str,
                         width: int = 640, height: int = 280,
                         pad_l: int = 56, pad_r: int = 16,
                         pad_t: int = 30, pad_b: int = 34) -> str:
    """Inner SVG markup (no <svg> wrapper) for one histogram panel."""
    plot_w = width - pad_l - pad_r
    plot_h = height - pad_t - pad_b
    cmax = max(max(counts), 1)
    x0, x1 = float(edges[0]), float(edges[-1])
    span = (x1 - x0) or 1.0
    parts = [
        f'<text x="{pad_l}" y="{pad_t - 12}" fill="{_INK}" '
        f'font-size="13" font-weight="600">{html.escape(title)}</text>']
    # recessive horizontal gridlines at 0%, 50%, 100% of max count
    for frac in (0.0, 0.5, 1.0):
        gy = pad_t + plot_h * (1 - frac)
        parts.append(f'<line x1="{pad_l}" y1="{gy:.2f}" '
                     f'x2="{pad_l + plot_w}" y2="{gy:.2f}" '
                     f'stroke="{_GRID}" stroke-width="1"/>')
        parts.append(f'<text x="{pad_l - 6}" y="{gy + 4:.2f}" fill="{_INK2}" '
                     f'font-size="10" text-anchor="end">'
                     f'{_fmt(cmax * frac)}</text>')
    for i, c in enumerate(counts):
        bx = pad_l + plot_w * (float(edges[i]) - x0) / span
        bw = plot_w * (float(edges[i + 1]) - float(edges[i])) / span
        bh = plot_h * (c / cmax)
        if bh <= 0:
            continue
        # 2px gap between adjacent fills
        parts.append(_bar_path(bx + 1, pad_t + plot_h - bh,
                               max(bw - 2, 0.5), bh))
    # x axis: min / max edge labels in secondary ink
    parts.append(f'<text x="{pad_l}" y="{height - pad_b + 16}" '
                 f'fill="{_INK2}" font-size="10">{_fmt(x0)}</text>')
    parts.append(f'<text x="{pad_l + plot_w}" y="{height - pad_b + 16}" '
                 f'fill="{_INK2}" font-size="10" text-anchor="end">'
                 f'{_fmt(x1)}</text>')
    return "".join(parts)


def _svg_doc(inner: str, width: int, height: int) -> str:
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" viewBox="0 0 {width} {height}" '
            f'font-family="system-ui, sans-serif">'
            f'<rect width="{width}" height="{height}" fill="{_SURFACE}"/>'
            f'{inner}</svg>')


def _maybe_save(svg: str, save_path: str | None) -> str:
    if save_path:
        with open(save_path, "w", encoding="utf-8") as f:
            f.write(svg)
    return svg


def _hist_data(state: DatasetState, column: str):
    ns = state.columns[column].numeric
    if ns is None or not ns.histogram:
        raise ValueError(f"no histogram for column {column!r}")
    return ns.histogram["bin_edges"], ns.histogram["bin_counts"]


def plot_col_histogram(state: DatasetState, column: str, ax=None,
                       save_path: str | None = None, backend: str = "auto"):
    """One column's histogram. matplotlib → returns the Axes; svg →
    returns the SVG document string (written to save_path when given)."""
    edges, counts = _hist_data(state, column)
    if _pick_backend(backend) == "svg" and ax is None:
        inner = _svg_histogram_group(edges, counts, f"histogram: {column}")
        return _maybe_save(_svg_doc(inner, 640, 280), save_path)
    plt = _require_matplotlib()
    own_fig = ax is None
    if own_fig:
        _, ax = plt.subplots(figsize=(8, 4))
    widths = [edges[i + 1] - edges[i] for i in range(len(counts))]
    ax.bar(edges[:-1], counts, width=widths, align="edge")
    ax.set_title(f"histogram: {column}")
    ax.set_xlabel(column)
    ax.set_ylabel("count")
    if save_path and own_fig:
        plt.savefig(save_path, bbox_inches="tight")
        plt.close()
    return ax


def plot_histograms(state: DatasetState, columns: list[str] | None = None,
                    save_path: str | None = None, backend: str = "auto"):
    """All numeric-column histograms, stacked vertically (small
    multiples — one panel per column, shared styling, no dual axes)."""
    cols = [c for c in (columns or state.column_order)
            if state.columns[c].numeric and state.columns[c].numeric.histogram]
    if not cols:
        raise ValueError("no histogram-bearing columns to plot")
    if _pick_backend(backend) == "svg":
        w, panel_h = 640, 280
        groups = []
        for i, c in enumerate(cols):
            edges, counts = _hist_data(state, c)
            inner = _svg_histogram_group(edges, counts, f"histogram: {c}",
                                         width=w, height=panel_h)
            groups.append(f'<g transform="translate(0,{i * panel_h})">'
                          f'{inner}</g>')
        return _maybe_save(_svg_doc("".join(groups), w, panel_h * len(cols)),
                           save_path)
    plt = _require_matplotlib()
    fig, axes = plt.subplots(len(cols), 1, figsize=(8, 3 * len(cols)))
    if len(cols) == 1:
        axes = [axes]
    for ax, c in zip(axes, cols):
        plot_col_histogram(state, c, ax=ax, backend="matplotlib")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_missing_values_matrix(state: DatasetState,
                               save_path: str | None = None,
                               backend: str = "auto"):
    """Null-ratio bar matrix from profile state (the reference plots
    per-row null spans; at 100 TB rows aren't enumerable — ratios are the
    scale-safe equivalent)."""
    cols = state.column_order
    ratios = [state.columns[c].null_count / max(state.row_count, 1)
              for c in cols]
    if _pick_backend(backend) == "svg":
        row_h, pad_l, pad_r, pad_t, pad_b = 24, 150, 60, 30, 24
        w = 640
        plot_w = w - pad_l - pad_r
        h = pad_t + row_h * len(cols) + pad_b
        parts = [f'<text x="{pad_l}" y="{pad_t - 12}" fill="{_INK}" '
                 f'font-size="13" font-weight="600">null ratio by column</text>']
        for frac in (0.0, 0.5, 1.0):
            gx = pad_l + plot_w * frac
            parts.append(f'<line x1="{gx:.2f}" y1="{pad_t}" x2="{gx:.2f}" '
                         f'y2="{pad_t + row_h * len(cols)}" '
                         f'stroke="{_GRID}" stroke-width="1"/>')
            parts.append(f'<text x="{gx:.2f}" y="{h - 8}" fill="{_INK2}" '
                         f'font-size="10" text-anchor="middle">{frac:g}</text>')
        for i, (c, r) in enumerate(zip(cols, ratios)):
            by = pad_t + i * row_h
            parts.append(f'<text x="{pad_l - 8}" y="{by + 15}" fill="{_INK2}" '
                         f'font-size="11" text-anchor="end">'
                         f'{html.escape(str(c))}</text>')
            bw = plot_w * min(r, 1.0)
            if bw > 0:
                parts.append(
                    f'<rect x="{pad_l}" y="{by + 3}" width="{bw:.2f}" '
                    f'height="{row_h - 8}" rx="2" fill="{_SERIES}"/>')
            parts.append(f'<text x="{pad_l + bw + 6:.2f}" y="{by + 15}" '
                         f'fill="{_INK2}" font-size="10">{r:.3g}</text>')
        return _maybe_save(_svg_doc("".join(parts), w, h), save_path)
    plt = _require_matplotlib()
    fig, ax = plt.subplots(figsize=(8, 0.4 * len(cols) + 1))
    ax.barh(cols, ratios)
    ax.set_xlabel("null ratio")
    ax.set_xlim(0, 1)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig
