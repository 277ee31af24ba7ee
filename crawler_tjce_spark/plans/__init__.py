"""Crawl-scheduling plans: frontier scoring/picking, robots filtering,
bloom- and cuckoo-accelerated exact seen-set (the cuckoo variant adds
deletion — forced re-crawl / TTL eviction)."""
