#!/bin/bash
# Poll the axon TPU relay until it answers; append status lines to
# /tmp/relay_watch.log. Run detached; kill via /tmp/relay_watch.pid.
# Each probe runs in a fresh subprocess under timeout because a
# down-but-registering relay HANGS jax.devices() (see memory notes).
echo $$ > /tmp/relay_watch.pid
while true; do
  if timeout 75 python -c "
import jax
jax.config.update('jax_platforms', 'axon,cpu')
ds = jax.devices()
assert any('Tpu' in str(type(d)) or 'TPU' in str(d) for d in ds), ds
print('UP', ds[0])
" >> /tmp/relay_watch.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) RELAY UP" >> /tmp/relay_watch.log
    exit 0
  fi
  echo "$(date -u +%FT%TZ) down" >> /tmp/relay_watch.log
  sleep 120
done
