"""Process-worker-mode pipeline test (DALI parallel external source parity)."""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import ImageRange01Normalizer


class TinyProvider(DataProvider):
    """Picklable provider (module-level class; spawn workers re-import it)."""

    @property
    def sample_data_structure(self):
        sdg = SampleDataGroup()
        sdg.add_data_field("image", DType.UINT8)
        sdg.add_data_field("idx", DType.INT32)
        return sdg

    def get_data(self, sample_index):
        sdg = self.sample_data_structure
        sdg["image"] = np.full((4, 6, 3), sample_index % 250, np.uint8)
        sdg["idx"] = sample_index
        return sdg

    def get_number_of_samples(self):
        return 8


@pytest.mark.parametrize("worker_mode", ["thread", "process"])
def test_pipeline_worker_modes_agree(worker_mode):
    inp = ShuffledShardedInputCallable(TinyProvider(), batch_size=4, shuffle=False)
    definition = PipelineDefinition(
        inp, [ImageRange01Normalizer("image")],
        check_data_format=False, copy_external_source_passthrough_outputs=False,
    )
    pipe = definition.get_pipeline(
        batch_size=4, num_threads=2, seed=0, worker_mode=worker_mode
    )
    try:
        batch = pipe.run()
        np.testing.assert_array_equal(np.asarray(batch["idx"]), [0, 1, 2, 3])
        img = np.asarray(batch["image"])
        np.testing.assert_allclose(img[1].max(), 1 / 255, atol=1e-6)
        batch2 = pipe.run()
        np.testing.assert_array_equal(np.asarray(batch2["idx"]), [4, 5, 6, 7])
        with pytest.raises(StopIteration):
            pipe.run()
        pipe.reset()
        b3 = pipe.run()
        np.testing.assert_array_equal(np.asarray(b3["idx"]), [0, 1, 2, 3])
    finally:
        pipe.stop()
