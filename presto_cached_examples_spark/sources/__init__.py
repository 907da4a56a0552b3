"""Sources — file-format scan sources and table catalog.

Reference analog: the FatFS byte-stream source surface
(/root/reference/src/fileio.cpp:8-44 — open/read/seek/tell/close) maps
to `spark.read.<format>(path)` with vectorized, pushdown-capable scans
(SURVEY.md §2.A R21-R25).
"""
