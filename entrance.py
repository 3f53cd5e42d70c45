#!/usr/bin/env python3
"""CLI shim preserving the reference invocation:

    python entrance.py {train_fp,ptq} --config config/<task>_<mode>.yaml ...
"""
from efficientq_tpu.cli.entrance import main

if __name__ == "__main__":
    main()
