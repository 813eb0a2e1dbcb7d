#!/usr/bin/env python
"""Drop-in CLI shim matching the reference's `python extract.py <stage> --flags`
invocation (reference: extract/extract.py:837-850)."""
from deep_spectral_tpu.pipeline.cli import main

if __name__ == "__main__":
    main()
