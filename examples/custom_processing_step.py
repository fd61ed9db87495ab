"""Template: writing a custom processing step.

Parity: reference ``dali_pipeline_framework/examples/
simple_processing_step_example/simple_example_image_decoder.py`` and the
``example_package`` build templates — the canonical patterns for extending
the framework.

A step implements two methods:

* ``_check_and_adjust_data_format_input_to_output`` — validate the input
  blueprint, return the output blueprint (construction time, free per batch).
* ``_process`` — transform ONE SAMPLE's data. Host steps get numpy arrays;
  device steps get traced jnp arrays inside the fused XLA program (write the
  math with the ``xp_for`` helper and it works in both placements).

Run:  python examples/custom_processing_step.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from accvlab_tpu.pipeline import DType, SampleDataGroup
from accvlab_tpu.pipeline.processing_steps import PipelineStepBase
from accvlab_tpu.pipeline.processing_steps._common import xp_for


class GrayscaleConverter(PipelineStepBase):
    """Convert matching RGB images to single-channel grayscale.

    Demonstrates: field search by name, dtype change, randomness injection
    (a random gain drawn per sample from the injected RandomContext).
    """

    placement = "device"  # fuses into the per-batch XLA program

    def __init__(self, image_name, random_gain_range=None):
        super().__init__()
        self._image_name = image_name
        self._gain_range = random_gain_range

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        for path in data.find_all_occurrences(self._image_name):
            image = data.get_item_in_path(path)
            xp = xp_for(image)
            luma = xp.asarray(np.array([0.299, 0.587, 0.114], np.float32))
            gray = xp.asarray(image).astype(np.float32) @ luma
            if self._gain_range is not None:
                gain = self.random.uniform(*self._gain_range)
                gray = gray * gain
            data.change_type_of_data_and_remove_data(path, DType.FLOAT)
            data.set_item_in_path(path, gray[..., None])
        return data

    def _check_and_adjust_data_format_input_to_output(self, data_empty):
        paths = data_empty.find_all_occurrences(self._image_name)
        if not paths:
            raise KeyError(f"No image fields named '{self._image_name}' found")
        for path in paths:
            data_empty.change_type_of_data_and_remove_data(path, DType.FLOAT)
        return data_empty


def main():
    from accvlab_tpu.pipeline import ScriptedRandomContext

    sdg = SampleDataGroup()
    sdg.add_data_field("image", DType.UINT8)
    sdg["image"] = np.full((4, 6, 3), 100, np.uint8)

    step = GrayscaleConverter("image", random_gain_range=(0.5, 1.5))
    rng = ScriptedRandomContext()
    rng.script_uniform(0.5, 1.5, [1.0])
    step.set_random_context(rng)

    out = step(sdg)  # __call__ also validates the advertised output format
    print("output image:", out["image"].shape, out["image"].dtype)
    print("value:", float(out["image"][0, 0, 0]), "(expect 100.0)")


if __name__ == "__main__":
    main()
