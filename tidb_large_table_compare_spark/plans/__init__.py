"""Orchestration dataflow: discover → plan → execute → report.

The reference wires these stages with files on disk and subprocesses
(SURVEY.md §3); here they are one driver program over DataFrames.
"""
