"""GCP region latency prober (reference hub/google/__init__.py:1-159).

Pings each region's Artifact Registry endpoint and ranks by mean latency —
used to pick the closest region for HUB-hosted training. urllib transport
(no requests dep); the probe function is injectable so the ranking logic is
testable offline, and real probing is skipped when the host has no egress.
"""

from __future__ import annotations

import concurrent.futures
import statistics
import time
import urllib.request

# region -> (tier, city, country): GCP's public region catalog
_T1 = {
    "asia-east1": ("Taiwan", "China"),
    "asia-northeast1": ("Tokyo", "Japan"),
    "asia-northeast2": ("Osaka", "Japan"),
    "europe-north1": ("Hamina", "Finland"),
    "europe-southwest1": ("Madrid", "Spain"),
    "europe-west1": ("St. Ghislain", "Belgium"),
    "europe-west4": ("Eemshaven", "Netherlands"),
    "europe-west8": ("Milan", "Italy"),
    "europe-west9": ("Paris", "France"),
    "me-west1": ("Tel Aviv", "Israel"),
    "us-central1": ("Iowa", "United States"),
    "us-east1": ("South Carolina", "United States"),
    "us-east4": ("Northern Virginia", "United States"),
    "us-east5": ("Columbus", "United States"),
    "us-south1": ("Dallas", "United States"),
    "us-west1": ("Oregon", "United States"),
}
_T2 = {
    "asia-east2": ("Hong Kong", "China"),
    "asia-northeast3": ("Seoul", "South Korea"),
    "asia-south1": ("Mumbai", "India"),
    "asia-south2": ("Delhi", "India"),
    "asia-southeast1": ("Jurong West", "Singapore"),
    "asia-southeast2": ("Jakarta", "Indonesia"),
    "australia-southeast1": ("Sydney", "Australia"),
    "australia-southeast2": ("Melbourne", "Australia"),
    "europe-central2": ("Warsaw", "Poland"),
    "europe-west10": ("Berlin", "Germany"),
    "europe-west12": ("Turin", "Italy"),
    "europe-west2": ("London", "United Kingdom"),
    "europe-west3": ("Frankfurt", "Germany"),
    "europe-west6": ("Zurich", "Switzerland"),
    "me-central1": ("Doha", "Qatar"),
    "northamerica-northeast1": ("Montreal", "Canada"),
    "northamerica-northeast2": ("Toronto", "Canada"),
    "southamerica-east1": ("Sao Paulo", "Brazil"),
    "southamerica-west1": ("Santiago", "Chile"),
    "us-west2": ("Los Angeles", "United States"),
    "us-west3": ("Salt Lake City", "United States"),
    "us-west4": ("Las Vegas", "United States"),
}


class GCPRegions:
    """GCP region latency prober for choosing upload endpoints (reference hub/google/__init__.py:159)."""
    def __init__(self, probe=None):
        self.regions = {**{k: (1, *v) for k, v in _T1.items()}, **{k: (2, *v) for k, v in _T2.items()}}
        self._probe = probe or self._http_head_latency

    def tier1(self):
        return [r for r, (t, *_loc) in self.regions.items() if t == 1]

    def tier2(self):
        return [r for r, (t, *_loc) in self.regions.items() if t == 2]

    @staticmethod
    def _http_head_latency(region: str, timeout: float = 5.0) -> float:
        """One HEAD round-trip to the region's registry endpoint, ms (inf on failure)."""
        url = f"https://{region}-docker.pkg.dev"
        try:
            t0 = time.time()
            req = urllib.request.Request(url, method="HEAD")
            urllib.request.urlopen(req, timeout=timeout).close()  # noqa: S310
            return (time.time() - t0) * 1000.0
        except Exception:  # noqa: BLE001 - any network failure means unreachable
            return float("inf")

    def _ping_region(self, region: str, attempts: int = 1):
        """(region, mean, std, min, max) latency over `attempts` probes."""
        lat = [v for v in (self._probe(region) for _ in range(attempts)) if v != float("inf")]
        if not lat:
            return region, float("inf"), float("inf"), float("inf"), float("inf")
        return region, statistics.mean(lat), statistics.stdev(lat) if len(lat) > 1 else 0.0, min(lat), max(lat)

    def lowest_latency(self, top: int = 1, verbose: bool = False, tier: int | None = None, attempts: int = 1):
        """Rank regions by mean probe latency; returns the `top` best tuples."""
        names = [r for r, (t, *_l) in self.regions.items() if tier is None or t == tier]
        with concurrent.futures.ThreadPoolExecutor(max_workers=50) as ex:
            results = list(ex.map(lambda r: self._ping_region(r, attempts), names))
        results.sort(key=lambda x: x[1])
        if verbose:
            for region, mean, std, lo, hi in results:
                t, city, country = self.regions[region]
                stat = "timeout" if mean == float("inf") else f"{mean:.0f} ± {std:.0f} ms ({lo:.0f}-{hi:.0f})"
                print(f"{region:<25} {city}, {country:<20} tier{t} {stat}")
        return results[:top]
