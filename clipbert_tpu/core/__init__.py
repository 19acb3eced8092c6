from clipbert_tpu.core.config import ModelConfig, RunConfig, load_run_config
from clipbert_tpu.core.dtypes import Policy
from clipbert_tpu.core.mesh import make_mesh, data_shard, replicate
