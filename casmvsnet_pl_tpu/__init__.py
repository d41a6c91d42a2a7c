"""casmvsnet_pl_tpu — a TPU-native (JAX/XLA/Pallas) multi-view-stereo framework.

Re-designed from scratch with the capabilities of kwea123/CasMVSNet_pl
(reference mounted read-only at /root/reference): cascaded plane-sweep depth
inference, DTU/BlendedMVS/Tanks&Temples data pipelines, data-parallel training
over a TPU mesh, and depth filtering/fusion into colored point clouds.

Layout
------
- ``ops``       pure-jax geometry kernels (homography warp, bilinear sampling,
                depth-hypothesis windows, soft-argmax regression) + Pallas paths
- ``models``    flax modules: FPN feature net, 3D cost regularization U-Net,
                the cascade orchestrator
- ``data``      dataset readers (DTU / BlendedMVS / Tanks) + host-side batching
- ``parallel``  device-mesh / sharding helpers (the "distributed backend")
- ``engine``    training system: train state, loops, val aggregation, ckpts
- ``utils``     optax optimizer/schedule factories, checkpoints, visualization
"""

__version__ = "0.1.0"
