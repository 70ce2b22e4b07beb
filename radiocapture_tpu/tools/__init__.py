"""Offline/ops tools (reference file_to_wav.py, util/diag_scope.py,
audio/cleanup.sh equivalents)."""
