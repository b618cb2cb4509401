"""`python -m clp_core_spark` == the spark-submit job entry."""

import sys

from clp_core_spark.job import main

sys.exit(main())
