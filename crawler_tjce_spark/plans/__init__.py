"""Crawl-scheduling plans: frontier scoring/picking, robots filtering,
bloom-accelerated exact seen-set."""
