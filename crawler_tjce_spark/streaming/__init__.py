"""Iterative crawl execution: the checkpointed wave loop.

The reference's crawl is a sequential ``while True`` pagination loop
(``crawler/crawler.py:556-677``). Its Spark restatement is not
Structured Streaming (there is no unbounded source — SURVEY.md §1.4)
but a driver-side loop of deterministic BFS supersteps ("waves") over
DataFrame state, checkpointed per wave so a killed run resumes exactly.
"""
