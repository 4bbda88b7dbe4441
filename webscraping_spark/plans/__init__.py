"""Crawl plans: the BSP superstep loop (the engine) and the sequential
Py3 semantic oracle (the ground truth it must match)."""
