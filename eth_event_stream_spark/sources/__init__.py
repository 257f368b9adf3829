from .fixtures import EthLogsFixture, generate_eth_logs  # noqa: F401
