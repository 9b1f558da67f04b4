#!/bin/bash
# Environment setup for denet_tpu CLIs (replaces the reference's THEANO_FLAGS
# machinery — JAX reads its own env vars; device selection is automatic).
export DENET_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="$DENET_DIR:$PYTHONPATH"
