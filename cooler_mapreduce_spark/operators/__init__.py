"""Operator/query modules. Each registers its queries via ``registry.query``.

Coverage map (SURVEY.md §2.4): ``parity`` holds the reference's four
demonstrated/designed workloads; the remaining modules fan out across the
categories the reference lacks but our engine must provide natively (joins,
windows, grouping sets, set ops, scalar function suites, dedup/similarity/
text-analysis, multimodal plumbing, and the RDD map-reduce compat surface).
"""
