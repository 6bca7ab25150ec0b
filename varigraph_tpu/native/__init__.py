from .loader import get_fastq_lib, native_available
