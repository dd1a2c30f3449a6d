import sys

from nsc_tpu.train.loop import main

sys.exit(main())
