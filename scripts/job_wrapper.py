#!/usr/bin/env python
"""Thin spark-submit driver script: delegates to the packaged CLI.

    spark-submit --py-files dist/fluent_plugin_geoip_spark.zip \
        scripts/job_wrapper.py --output /path/routed [--input ... --resume ...]
"""

import sys

from fluent_plugin_geoip_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
