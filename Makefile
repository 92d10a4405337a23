# Round-loop targets — the verify/bench surface the driver and the
# judge run, so the close-out sequence is one command per gate.
# See .claude/skills/verify/SKILL.md for the same recipe with notes.

SF001   ?= /root/testdata/sf0.001
SF01    ?= /root/testdata/sf0.01
SF1     ?= /root/testdata/sf0.1
ROUND   ?= r14
X10DIR  ?= target/scale/x10

.PHONY: test verify oracle-lint bench-sf001 bench-sf01 bench-x10 \
        slope-gate x10-gate gates

test:
	sbt -batch test

# Correctness dump + DuckDB hash compare (the driver's t2 gate).
verify:
	rm -rf /tmp/verify_out
	SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $(SF01) /tmp/verify_out"
	python3 tools/check_oracle.py $(SF01) /tmp/verify_out

# Regenerate the oracle dump FROM THE FINAL TREE, then lint every
# oracle's DuckDB output dtypes (no DECIMAL/HUGEINT columns) — the dump
# must be re-run after the last registered query lands, or the lint
# checks a stale surface.
oracle-lint:
	sbt -batch "runMain graft.OracleDump target/oracle_sql.json"
	cp target/oracle_sql.json bench/oracle_sql.json
	python3 tools/oracle_types.py $(SF001) target/oracle_sql.json

bench-sf001:
	SPARK_GRAFT_SF_DIR=$(SF01) SPARK_GRAFT_CPUS=32 \
	  SPARK_GRAFT_BENCH_OUT=bench/$(ROUND)_sf0.01.json sbt -batch "runMain graft.Bench"

bench-sf01:
	SPARK_GRAFT_SF_DIR=$(SF1) SPARK_GRAFT_CPUS=32 \
	  SPARK_GRAFT_BENCH_OUT=bench/$(ROUND)_sf0.1.json sbt -batch "runMain graft.Bench"

$(X10DIR):
	sbt -batch "runMain graft.ScaleData $(SF1) $(X10DIR) 10"

bench-x10: $(X10DIR)
	SPARK_GRAFT_SF_DIR=$(X10DIR) SPARK_GRAFT_CPUS=32 \
	  SPARK_GRAFT_BENCH_OUT=bench/$(ROUND)_x10.json sbt -batch "runMain graft.Bench"

slope-gate:
	python3 tools/slope_gate.py bench/$(ROUND)_sf0.01.json \
	  bench/$(ROUND)_sf0.1.json 10 bench/SLOPE_ADJUDICATIONS.json

x10-gate:
	python3 tools/x10_gate.py bench/$(ROUND)_sf0.1.json \
	  bench/$(ROUND)_x10.json $(X10DIR) bench/SLOPE_ADJUDICATIONS.json

# Everything the judge re-runs, in order.
gates: test verify oracle-lint bench-sf001 bench-sf01 slope-gate bench-x10 x10-gate
