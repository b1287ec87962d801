"""Fine-vs-coarse violin plot (reference mlmc/plot/violinplot.py:28-69)."""
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def fine_coarse_violinplot(dframe, file="violinplot.pdf"):
    """Split violins of fine vs coarse sample values per level.

    :param dframe: pandas DataFrame with columns 'samples', 'type'
        ('fine'|'coarse'), 'level' (label string)
    """
    import seaborn as sns

    fig, ax = plt.subplots(figsize=(12, 8))
    sns.violinplot(data=dframe, x="level", y="samples", hue="type",
                   split=True, inner="quart", ax=ax)
    ax.set_xlabel("levels")
    ax.set_ylabel("samples")
    if file:
        fig.savefig(file)
        plt.close(fig)
    else:
        fig.show()
    return ax
