"""Driver-side plans: the BSP crawl superstep loop and checkpoint/resume."""
