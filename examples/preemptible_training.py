"""Preemption-safe production training loop: the full resume story, composed.

TPU fleets preempt. This example assembles every piece the framework ships
for surviving that without losing data-accounting exactness:

* input: synthetic JPEG dataset -> ``TPUPipeline`` with host JPEG decode,
  RNG-sensitive augmentation (``PhotoMetricDistorter``) and a device-fused
  preprocess program, sharded over a ``jax.sharding.Mesh`` data axis,
* training: a CenterNet backbone under ``jit`` inside the mesh context
  (data-parallel; XLA inserts the gradient ``psum``),
* checkpoint: ``models.checkpoint`` (orbax) saving params + opt state +
  ``pipe.get_state()`` — the CONSUMED pipeline position — every K steps,
* preemption: the process "dies" mid-epoch; everything is rebuilt from the
  constructor arguments and ``set_state`` restores the stream.

The proof obligation (asserted when run): the resumed run's losses and
final parameters are BIT-IDENTICAL to an uninterrupted run's — the batch
stream (host + device augmentation RNG included) continues from the first
batch the interrupted run never consumed; preempted prefetched batches are
re-produced, not skipped (reference has no counterpart: its samplers
cannot restore a mid-epoch position, SURVEY §5.4).

Run (single chip, or an 8-device CPU mesh):
    python examples/preemptible_training.py
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/preemptible_training.py
"""

import io
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

from accvlab_tpu.models.centernet import CenterNetDetector
from accvlab_tpu.models.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from accvlab_tpu.parallel import make_mesh
from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import (
    ImageDecoder,
    ImageRange01Normalizer,
    ImageToTileSizePadder,
    PhotoMetricDistorter,
)

NUM_CLASSES = 3
HW = (24, 32)


class SyntheticProvider(DataProvider):
    """Tiny JPEG dataset; 32 samples keep a full demo epoch at 4 batches so
    the run crosses an epoch boundary AND the preemption lands mid-epoch."""

    def __init__(self, n=32):
        from PIL import Image

        self._jpegs = []
        rng = np.random.default_rng(7)
        for i in range(n):
            img = rng.integers(0, 255, (*HW, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=92)
            self._jpegs.append(np.frombuffer(buf.getvalue(), np.uint8).copy())
        self._n = n

    @property
    def sample_data_structure(self):
        sdg = SampleDataGroup()
        sdg.add_data_field("image", DType.UINT8)
        sdg.add_data_field("label", DType.INT32)
        return sdg

    def get_data(self, i):
        sdg = self.sample_data_structure
        sdg["image"] = self._jpegs[i]
        sdg["label"] = i % NUM_CLASSES
        return sdg

    def get_number_of_samples(self):
        return self._n


def build_pipeline(mesh, batch_size):
    inp = ShuffledShardedInputCallable(
        SyntheticProvider(), batch_size=batch_size, shuffle=True
    )
    definition = PipelineDefinition(
        inp,
        [
            ImageDecoder("image"),
            ImageToTileSizePadder("image", 8),
            ImageRange01Normalizer("image"),
            # RNG-sensitive device augmentation: proves the resumed stream
            # reproduces the augmentation RNG, not just the sample order
            PhotoMetricDistorter(
                "image",
                min_max_brightness=[-0.1, 0.1],
                min_max_hue=[-8.0, 8.0],
                min_max_contrast=[0.9, 1.1],
                min_max_saturation=[0.9, 1.1],
            ),
        ],
    )
    return definition.get_pipeline(
        batch_size=batch_size, num_threads=2, seed=11, mesh=mesh
    )


def make_train_state(mesh, batch_size):
    model = CenterNetDetector(num_classes=NUM_CLASSES, width=8)
    opt = optax.adam(1e-3)
    example = jnp.zeros((1, *HW, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), example)
    opt_state = opt.init(params)
    # replicate the train state over the mesh (batches shard over 'data')
    replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    params, opt_state = jax.device_put((params, opt_state), replicated)

    def train_step(params, opt_state, images, labels):
        def loss_fn(p):
            out = model.apply(p, images)
            pooled = jnp.mean(out["heatmap"].astype(jnp.float32), axis=(1, 2))
            onehot = jax.nn.one_hot(labels, NUM_CLASSES)
            return jnp.mean((jax.nn.sigmoid(pooled) - onehot) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    # shared_jit instead of jax.jit: a restarted/resumed run rebuilds this
    # exact step function, and the process-global program cache hands back
    # the already-compiled executable — the restart pays no XLA compile
    # (accvlab_tpu/tools/program_cache.py; the pipeline's fused device
    # program shares the same way). Built lazily on the first batch because
    # the padded image shape is only known then.
    from accvlab_tpu.tools import shared_jit

    # keyed by the batch's shape/dtype signature (like the pipeline executor
    # keys its device fns): a shared program is pinned to its traced shapes,
    # and a later batch may pad differently
    fns = {}

    def step(params, opt_state, images, labels):
        sig = (images.shape, str(images.dtype), labels.shape, str(labels.dtype))
        fn = fns.get(sig)
        if fn is None:
            fn = fns[sig] = shared_jit(
                train_step, (params, opt_state, images, labels)
            )
        return fn(params, opt_state, images, labels)

    return params, opt_state, step


def next_batch(pipe):
    """Production epoch handling: reset + continue at epoch end."""
    try:
        return pipe.run()
    except StopIteration:
        pipe.reset()
        return pipe.run()


def train(mesh, batch_size, num_steps, ckpt_dir=None, ckpt_every=0,
          preempt_after=None, resume_from=None):
    """Run ``num_steps`` steps; optionally checkpoint, simulate a
    preemption (return early), or resume from a checkpoint first."""
    pipe = build_pipeline(mesh, batch_size)
    params, opt_state, train_step = make_train_state(mesh, batch_size)
    step = 0

    if resume_from is not None:
        params, opt_state, meta = restore_checkpoint(
            resume_from, {"params": params, "opt_state": opt_state}
        )
        replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        params, opt_state = jax.device_put((params, opt_state), replicated)
        step = int(meta["step"])
        pipe.set_state(meta["pipeline"])

    losses = []
    while step < num_steps:
        batch = next_batch(pipe)
        with mesh:
            params, opt_state, loss = train_step(
                params, opt_state, batch["image"], batch["label"]
            )
        losses.append(float(loss))
        step += 1
        if ckpt_every and ckpt_dir and step % ckpt_every == 0:
            # asynchronous: the loop never blocks on checkpoint I/O;
            # keep=3: older committed checkpoints are garbage-collected
            save_checkpoint(
                ckpt_dir, step, params, opt_state,
                pipeline_state=pipe.get_state(),
                asynchronous=True, keep=3,
            )
        if preempt_after is not None and step >= preempt_after:
            break  # simulated preemption: no cleanup, no draining
    if ckpt_dir:
        # a real preemption handler flushes in-flight saves on SIGTERM —
        # uncommitted async saves are lost with the process otherwise
        wait_for_checkpoints()
    pipe.stop()
    return losses, params


def main(num_steps=6, preempt_after=3, workdir=None):
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    batch_size = max(8, n_dev)  # divisible by the data axis
    owns_dir = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="accvlab_preempt_")
    try:
        # uninterrupted reference run
        ref_losses, ref_params = train(mesh, batch_size, num_steps)

        # run A: train, checkpointing every step; "preempted" after step 3
        train(mesh, batch_size, num_steps, ckpt_dir=workdir, ckpt_every=1,
              preempt_after=preempt_after)

        # run B: a fresh process would do exactly this — rebuild, restore,
        # continue to the end
        ckpt = latest_checkpoint(workdir)
        res_losses, res_params = train(mesh, batch_size, num_steps,
                                       resume_from=ckpt)

        # the resumed tail must match the uninterrupted run bit-for-bit
        np.testing.assert_array_equal(
            np.asarray(ref_losses[preempt_after:], np.float32),
            np.asarray(res_losses, np.float32),
        )
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(res_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print(
            f"preemption at step {preempt_after}/{num_steps} on a "
            f"{n_dev}-device mesh: resumed stream + final params "
            f"bit-identical to the uninterrupted run "
            f"(losses {['%.6f' % l for l in res_losses]})"
        )

        # ELASTIC resume: after a preemption the replacement slice may be a
        # different size — the checkpoint (replicated params + the consumed
        # stream position) restores onto ANY mesh. The batch stream is
        # bit-identical (host-side); training continues numerically
        # equivalently (gradients differ only by the data-axis psum
        # reduction order, so this check is allclose, not bit-equal).
        if n_dev >= 2:
            import jax as _jax

            half_mesh = make_mesh(devices=_jax.devices()[: n_dev // 2])
            el_losses, _ = train(half_mesh, batch_size, num_steps,
                                 resume_from=ckpt)
            np.testing.assert_allclose(
                np.asarray(ref_losses[preempt_after:], np.float64),
                np.asarray(el_losses, np.float64),
                rtol=1e-5,
            )
            print(
                f"elastic resume on a {n_dev // 2}-device mesh: same stream, "
                f"losses match the {n_dev}-device run to 1e-5"
            )
        return ref_losses, res_losses
    finally:
        if owns_dir:
            shutil.rmtree(workdir, ignore_errors=True)


def elastic_data_stanza():
    """Elastic DATA accounting across a fleet-size change.

    The mesh stanza above resumes the same global batch onto fewer devices
    of ONE host. On multi-host fleets each process runs its own pipeline
    shard — and a replacement fleet may have a different process count.
    ``ElasticShardedInputCallable`` + ``elastic_reshard`` keep sample
    accounting exact across that change: consumption is always a prefix of
    the epoch permutation, so a checkpoint taken by a W-shard fleet resumes
    on W' shards with no sample repeated or skipped."""
    from accvlab_tpu.pipeline.inputs import (
        ElasticShardedInputCallable,
        elastic_reshard,
    )

    n, bsz, seed = 32, 4, 11

    class UniqueLabelProvider(SyntheticProvider):
        # label = sample index, so delivered batches reveal exactly which
        # samples each fleet consumed
        def get_data(self, i):
            sdg = super().get_data(i)
            sdg["label"] = i
            return sdg

    def build_shard(shard_id, num_shards, extra=None):
        inp = ElasticShardedInputCallable(
            UniqueLabelProvider(n), bsz, shard_id=shard_id,
            num_shards=num_shards, shuffle=True, seed=seed, **(extra or {}),
        )
        definition = PipelineDefinition(
            inp, [ImageDecoder("image"), ImageRange01Normalizer("image")]
        )
        return definition.get_pipeline(batch_size=bsz, num_threads=1, seed=3)

    # W=2 fleet trains 2 lockstep steps, then is preempted
    fleet = [build_shard(s, 2) for s in range(2)]
    labels = []
    try:
        for _ in range(2):
            for p in fleet:
                labels.extend(np.asarray(p.run()["label"]).ravel().tolist())
        state = fleet[0].get_state()  # all shards agree on the counters
    finally:
        for p in fleet:
            p.stop()

    # replacement fleet has 3 processes: fold the checkpoint through
    # elastic_reshard and drain the epoch
    input_kwargs, new_state = elastic_reshard(
        state, batch_size=bsz, checkpoint_num_shards=2
    )
    fleet2 = [build_shard(s, 3, input_kwargs) for s in range(3)]
    try:
        for p in fleet2:
            p.set_state(dict(new_state))
        done = [False] * 3
        while not all(done):
            for i, p in enumerate(fleet2):
                if not done[i]:
                    try:
                        labels.extend(
                            np.asarray(p.run()["label"]).ravel().tolist()
                        )
                    except StopIteration:
                        done[i] = True
    finally:
        for p in fleet2:
            p.stop()

    # every epoch sample consumed exactly once across BOTH fleet shapes;
    # phase 1 consumed 2*4*2=16, phase 2 drains (32-16)//(4*3)=1 lockstep
    # step = 12 more (the 4-sample tail is dropped, standard epoch
    # semantics) -> 28 distinct samples, none repeated
    assert len(labels) == 28, len(labels)
    assert len(set(labels)) == len(labels), "a sample was repeated"
    print(
        f"elastic data accounting: 2-shard fleet preempted after 2 steps, "
        f"3-shard fleet drained the epoch — {len(labels)}/{n} samples, "
        "each exactly once"
    )


if __name__ == "__main__":
    main()
    elastic_data_stanza()
