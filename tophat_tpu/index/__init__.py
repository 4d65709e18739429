from tophat_tpu.index.fasta import Genome, read_fasta  # noqa: F401
from tophat_tpu.index.fm import FMIndex, build_fm_index  # noqa: F401
