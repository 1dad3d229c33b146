from .loader import GraphLoader, prefetch
from .synthetic import md17_like_dataset, oc20_like_dataset, qm9_like_dataset, random_molecule
from .stats import compute_stats
