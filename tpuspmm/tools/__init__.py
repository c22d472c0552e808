"""Offline data tooling — the counterpart of the reference's
utils/python_utils/ scripts (SURVEY.md §2.2 P1-P6) plus its mmio C tool
(§2.1 N19, served here by scipy.io + the optional native fast parser).

Each module is runnable as ``python -m tpuspmm.tools.<name>``:

- ``convert_mtx``      — .mtx → .csr/.coo/.bsr/both ELL pairs/dense.in
- ``gen_sparse``       — synthetic density-sweep directories
- ``gen_matrix``       — small random dense matrix files
- ``validate``         — scipy oracle, result.expect, *.out comparison
- ``fetch_suitesparse``— SuiteSparse collection downloader
"""
