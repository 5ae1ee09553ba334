"""Offline analysis tools (reference python/ directory, SURVEY.md §2.3).

Native replacements: the Bayes-Elo fit is an in-process Bradley-Terry
maximum-likelihood fit (no bayeselo.exe subprocess); plotting is gated on
matplotlib availability so the data paths run headless.
"""
