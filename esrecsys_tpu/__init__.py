"""esrecsys_tpu — a TPU-native embedding-retrieval framework.

A from-scratch rebuild of the capabilities of BBischof/ESRecsys (the companion
code of "Building Recommendation Systems in Python and JAX") as ONE engine with
three workloads as thin configs, designed TPU-first:

  * ``core``      — device mesh & sharding, config, PRNG discipline, tracking.
  * ``data``      — record IO (pb.b64.bz2 + tfrecord), vocabularies, input pipelines.
  * ``parallel``  — row-sharded embedding tables over the ``model`` mesh axis.
  * ``ops``       — losses, Pallas kernels (fused lookup+pool, streaming MIPS top-k),
                    on-device negative sampling.
  * ``models``    — Glove, playlist next-track tower, Shop-the-Look CNN two-tower,
                    text→URL sequence two-tower.
  * ``train``     — one jit'ed step-loop harness (donated state, metrics, Orbax
                    checkpoints) shared by every workload.
  * ``retrieval`` — catalog embedding builder + sharded brute-force MIPS top-k.
  * ``etl``       — wikipedia XML → docs → dictionaries → co-occurrence,
                    playlist JSON → tfrecord (replaces the reference's PySpark jobs).

The reference implements each of these once per example project
(wikipedia/, spotify/, pinterest/ — see SURVEY.md §1); here each is a single
shared subsystem.
"""

__version__ = "0.1.0"
