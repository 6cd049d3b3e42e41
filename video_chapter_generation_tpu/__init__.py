"""TPU-native video chapter generation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference system (SeoYeonnLee/Video-Chapter-Generation): given 1 fps video
frames + ASR subtitles, localize chapter boundaries with a two-stream
(BERT text + ResNet50-TSM vision) clip classifier and generate chapter
titles with a Pegasus-style summarizer.

Subpackages
-----------
core      : config tree, RNG, checkpointing, metrics scaffolding
data      : deterministic, torch-free data pipeline (clip grid, tokenizers,
            frame decode, datasets, loaders)
ops       : TPU kernels (temporal shift, fused preprocessing) — Pallas + XLA
models    : flax models (BERT, ResNet50-TSM, two-stream fusion, Pegasus, GPT)
parallel  : device mesh, shardings, collectives, optimizer-state sharding
train     : one generic pjit train loop + optimizers/schedules/objectives
eval      : boundary metrics (P/R/F@0/3/5, AUC/mAP), ROUGE, result writers
pipeline  : per-video orchestration (decode -> boundaries -> titles)
datasetkit: dataset acquisition/preparation utilities (parsing, flattening)
utils     : logging, timers, host memory tracking
"""

__version__ = "0.1.0"
