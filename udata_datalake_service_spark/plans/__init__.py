"""Crawl-plane dataflow (SURVEY §2.8) as pure DataFrame computations.

The reference's crawler is an asyncio loop whose *decisions* (what to
check, when to re-check, what changed, when to back off) are SQL queries.
Here each decision is a declarative plan over the checks/catalog lake
tables, usable both from a batch driver loop and from the Structured
Streaming variants in ``streaming/``.
"""
