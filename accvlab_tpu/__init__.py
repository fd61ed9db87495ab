"""accvlab_tpu — TPU-native toolkit for end-to-end efficient ADAS perception training.

A from-scratch JAX/XLA/Pallas re-design of NVIDIA's ACCV-Lab with the same
capabilities:

* :mod:`accvlab_tpu.ragged` — non-uniform batching (RaggedBatch + fused
  masked gather/scatter/reduction ops)           [= accvlab.batching_helpers]
* :mod:`accvlab_tpu.heatmap` — batched Gaussian heatmap rasterization
  (Pallas kernel)                                [= accvlab.draw_heatmap]
* :mod:`accvlab_tpu.polyline` — polyline arc-length interpolation
                                                 [= accvlab.lane_helpers]
* :mod:`accvlab_tpu.hostcopy` — async packed multi-tensor host->device copy
                                                 [= accvlab.multi_tensor_copier]
* :mod:`accvlab_tpu.pipeline` — structured data-loading/preprocessing graph
  framework with jit-compiled augmentations      [= accvlab.dali_pipeline_framework]
* :mod:`accvlab_tpu.video` — random-access GOP video decoding
                                                 [= accvlab.on_demand_video_decoder]
* :mod:`accvlab_tpu.tools` — Stopwatch / trace ranges / TensorDumper
                                                 [= accvlab.optim_test_tools]
* :mod:`accvlab_tpu.parallel` — device-mesh input sharding & batch
  distribution (the TPU-native substrate the reference gets from DALI+NCCL)
"""

__version__ = "0.7.0"
