"""``sc_generate_report`` equivalent — thin CLI over
``rankaae_tpu.report.generate_report`` (reference ``generate_report.py:218-296``)."""
from rankaae_tpu.report.generate_report import main

if __name__ == "__main__":
    main()
