"""PySpark-native analytics engine with the capability surface of
ulsdevteam/eprints-to-hyku-data-tool (an EPrints->Hyku migration ETL tool;
see /root/reference/README.md:2 — the reference snapshot contains no code,
so the operator inventory in SURVEY.md §2 is the specification).

Architecture: pure functions over Spark DataFrames. No custom execution
machinery — Catalyst/Tungsten/AQE own the physical plan (SURVEY.md §4).
"""

__version__ = "0.1.0"
