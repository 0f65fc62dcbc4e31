# One-command entry points (VERDICT r3 #7: a reproduction path that cannot
# strand results — every target that produces measurements commits them).

LOGDIR ?= /root/qlogs

.PHONY: test quality bench bench512 dryrun verify-tpu

test:            ## CPU test suite (8 virtual devices for sharding coverage)
	python -m pytest tests/ -x -q

quality:         ## full quality pipeline on the TPU chip; per-stage commits
	mkdir -p $(LOGDIR)
	LOGDIR=$(LOGDIR) bash benchmarks/run_quality_stage.sh pipeline

quality-stage:   ## one stage: make quality-stage STAGE=ar512 [HARD_END=epoch]
	mkdir -p $(LOGDIR)
	LOGDIR=$(LOGDIR) bash benchmarks/run_quality_stage.sh $(STAGE) $(HARD_END)

bench:           ## headline 256^2 serving bench (one JSON line)
	python -u bench.py --quick

bench512:        ## 1408-token paper-geometry serving bench
	python -u bench.py --resolution 512

dryrun:          ## multi-chip sharding dry run on an 8-device virtual mesh
	MAS_TPU_DRYRUN_CPU=1 JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

verify-tpu:      ## smoke the library end-to-end on the real TPU chip
	cd /tmp && python -c "import sys; sys.path.insert(0, '$(CURDIR)'); \
	  exec(open('$(CURDIR)/benchmarks/tpu_smoke.py').read())"
