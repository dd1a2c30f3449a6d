import sys

from nsc_tpu.eval.sweep import main

sys.exit(main())
