from .graphs import LinearFSM, statemap, make_hmms, make_lexicon
from .prepare_lfmmi_graphs import make_numerator_graphs, run_pipeline
