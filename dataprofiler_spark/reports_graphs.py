"""Report visualizations (optional extra).

Reference: reports/graphs.py:31-358 — plot_histograms (per numeric
column), plot_col_histogram, plot_missing_values_matrix. Driver-side
matplotlib over profile state; gated behind import-try exactly like the
reference's optional [reports] extra.
"""

from __future__ import annotations

from dataprofiler_spark.state import DatasetState


def _require_matplotlib():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "matplotlib is required for report graphs (reference ships this "
            "as the optional [reports] extra)") from e


def plot_col_histogram(state: DatasetState, column: str, ax=None,
                       save_path: str | None = None):
    plt = _require_matplotlib()
    ns = state.columns[column].numeric
    if ns is None or not ns.histogram:
        raise ValueError(f"no histogram for column {column!r}")
    edges = ns.histogram["bin_edges"]
    counts = ns.histogram["bin_counts"]
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
                    save_path: str | None = None):
    plt = _require_matplotlib()
    cols = [c for c in (columns or state.column_order)
            if state.columns[c].numeric and state.columns[c].numeric.histogram]
    if not cols:
        raise ValueError("no histogram-bearing columns to plot")
    fig, axes = plt.subplots(len(cols), 1, figsize=(8, 3 * len(cols)))
    if len(cols) == 1:
        axes = [axes]
    for ax, c in zip(axes, cols):
        plot_col_histogram(state, c, ax=ax)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_missing_values_matrix(state: DatasetState, save_path: str | None = None):
    """Null-ratio bar matrix from profile state (the reference plots
    per-row null spans; at 100 TB rows aren't enumerable — ratios are the
    scale-safe equivalent)."""
    plt = _require_matplotlib()
    cols = state.column_order
    ratios = [state.columns[c].null_count / max(state.row_count, 1)
              for c in cols]
    fig, ax = plt.subplots(figsize=(8, 0.4 * len(cols) + 1))
    ax.barh(cols, ratios)
    ax.set_xlabel("null ratio")
    ax.set_xlim(0, 1)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig
