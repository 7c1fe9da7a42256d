"""CRS registry / proj-string / WKT routing (gdal_ray.functions.crs).

Anchors are the published worked examples from EPSG Guidance Note 7-2 and
the OS / swisstopo projection guides — independent of the kernels under
test (reference parity: ogr/ogrspatialreference.cpp SetFromUserInput,
ogr/ogrct.cpp method routing)."""
import numpy as np
import pytest

from gdal_ray.functions import crs, geo, transformer as tr

BESSEL = dict(a=6377397.155, f=1 / 299.1528128)


class TestWorkedExamples:
    def test_osgb_os_guide_example(self):
        # OS guide: OSGB36 geographic 52d39'27.2531"N 1d43'4.5177"E
        # -> E 651409.903 N 313177.270
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        E, N = tr.tmerc_forward(np.array([lon]), np.array([lat]), lon0=-2.0,
                                k0=0.9996012717, fe=400000.0, fn=-100000.0,
                                a=6377563.396, f=1 / 299.3249646, lat0=49.0)
        assert abs(E[0] - 651409.903) < 1e-3
        assert abs(N[0] - 313177.270) < 1e-3

    def test_somerc_swisstopo_example(self):
        # swisstopo: 47d03'28.95659233"N 8d29'11.11127154"E (CH1903)
        # -> LV03 E 679520.05 N 212273.44
        phi = 47 + 3 / 60 + 28.95659233 / 3600
        lam = 8 + 29 / 60 + 11.11127154 / 3600
        E, N = tr.somerc_forward(
            np.array([lam]), np.array([phi]),
            lon0=7 + 26 / 60 + 22.50 / 3600, lat0=46 + 57 / 60 + 8.66 / 3600,
            k0=1.0, fe=600000.0, fn=200000.0, **BESSEL)
        assert abs(E[0] - 679520.05) < 0.01
        assert abs(N[0] - 212273.44) < 0.01

    def test_krovak_epsg_example(self):
        # EPSG G7-2: 50d12'32.4416"N 16d50'59.1790"E (S-JTSK)
        # -> southing 1050538.63, westing 568991.00 (cm-level vs the quoted
        # alpha_c rounding)
        phi = 50 + 12 / 60 + 32.4416 / 3600
        lam = 16 + 50 / 60 + 59.1790 / 3600
        Xs, Yw = tr.krovak_forward(np.array([lam]), np.array([phi]),
                                   east_north=False, **BESSEL)
        assert abs(Xs[0] - 1050538.63) < 0.05
        assert abs(Yw[0] - 568991.00) < 0.05

    def test_sterea_epsg_example(self):
        # EPSG G7-2 method 9809: Amersfoort / RD New, 53N 6E
        # -> E 196105.283 N 557057.739
        E, N = tr.sterea_forward(np.array([6.0]), np.array([53.0]),
                                 lon0=5.387638888888889,
                                 lat0=52.15616055555555, k0=0.9999079,
                                 fe=155000.0, fn=463000.0, **BESSEL)
        assert abs(E[0] - 196105.283) < 1e-3
        assert abs(N[0] - 557057.739) < 1e-3

    def test_lcc1sp_epsg_example(self):
        # EPSG G7-2 method 9801: Jamaica 1969 grid, 17d55'55.80"N
        # 76d56'37.26"W -> E 255966.58 N 142493.51 (Clarke 1866)
        a_c, b_c = 6378206.4, 6356583.8
        E, N = tr.lcc1sp_forward(
            np.array([-(76 + 56 / 60 + 37.26 / 3600)]),
            np.array([17 + 55 / 60 + 55.80 / 3600]),
            lon0=-77.0, lat0=18.0, k0=1.0, fe=250000.0, fn=150000.0,
            a=a_c, f=(a_c - b_c) / a_c)
        assert abs(E[0] - 255966.58) < 0.01
        assert abs(N[0] - 142493.51) < 0.01


class TestRoundtrips:
    CODES = ["EPSG:27700", "EPSG:31370", "EPSG:2056", "EPSG:5514",
             "EPSG:3112", "EPSG:28992", "EPSG:2157", "EPSG:3006",
             "EPSG:31467", "EPSG:23031", "EPSG:28407", "EPSG:27572",
             "EPSG:2180", "EPSG:3812", "EPSG:21781", "EPSG:5513"]
    # a lon/lat inside each grid's validity window
    PTS = {
        "EPSG:27700": (-1.5, 52.5), "EPSG:31370": (4.4, 50.8),
        "EPSG:2056": (7.5, 46.9), "EPSG:5514": (15.0, 49.8),
        "EPSG:3112": (134.0, -25.0), "EPSG:28992": (5.3, 52.1),
        "EPSG:2157": (-7.9, 53.3), "EPSG:3006": (15.8, 61.0),
        "EPSG:31467": (9.2, 50.5), "EPSG:23031": (2.1, 41.4),
        "EPSG:28407": (40.0, 55.0), "EPSG:27572": (2.5, 46.7),
        "EPSG:2180": (19.5, 52.0), "EPSG:3812": (4.4, 50.8),
        "EPSG:21781": (7.5, 46.9), "EPSG:5513": (15.0, 49.8),
    }

    @pytest.mark.parametrize("code", CODES)
    def test_wgs84_roundtrip(self, code):
        lon, lat = self.PTS[code]
        lon = np.array([lon]); lat = np.array([lat])
        x, y = crs.transform(lon, lat, "EPSG:4326", code)
        lo, la = crs.transform(x, y, code, "EPSG:4326")
        # the negated-params Helmert inverse is linearized: mm-level closure
        assert abs(lo[0] - lon[0]) < 1e-6
        assert abs(la[0] - lat[0]) < 1e-6

    def test_projected_to_projected(self):
        # OSGB -> Irish TM crosses two datums through WGS84
        x, y = crs.transform(np.array([-5.9]), np.array([54.6]),
                             "EPSG:4326", "EPSG:29903")
        x2, y2 = crs.transform(x, y, "EPSG:29903", "EPSG:2157")
        lo, la = crs.transform(x2, y2, "EPSG:2157", "EPSG:4326")
        assert abs(lo[0] + 5.9) < 1e-6 and abs(la[0] - 54.6) < 1e-6


class TestParsers:
    def test_proj_string_matches_registry(self):
        p = crs.resolve_crs(
            "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333"
            " +k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel"
            " +towgs84=674.374,15.056,405.346,0,0,0,0 +units=m")
        r = crs.epsg_def(2056)
        lon = np.array([8.0]); lat = np.array([46.5])
        xa, ya = crs.from_wgs84_lonlat(lon, lat, p)
        xb, yb = crs.from_wgs84_lonlat(lon, lat, r)
        assert abs(xa[0] - xb[0]) < 1e-6 and abs(ya[0] - yb[0]) < 1e-6

    def test_proj_utm(self):
        p = crs.resolve_crs("+proj=utm +zone=31 +ellps=WGS84")
        x, y = crs.from_wgs84_lonlat(np.array([6.0]), np.array([52.0]), p)
        E, N = tr.tmerc_forward(np.array([6.0]), np.array([52.0]), lon0=3.0)
        assert abs(x[0] - E[0]) < 1e-9 and abs(y[0] - N[0]) < 1e-9

    def test_wkt_osgb(self):
        wkt = ('PROJCS["OSGB36 / BNG",GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
               'SPHEROID["Airy 1830",6377563.396,299.3249646],'
               'TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,'
               '-20.4894]],PRIMEM["Greenwich",0],'
               'UNIT["degree",0.0174532925199433]],'
               'PROJECTION["Transverse_Mercator"],'
               'PARAMETER["latitude_of_origin",49],'
               'PARAMETER["central_meridian",-2],'
               'PARAMETER["scale_factor",0.9996012717],'
               'PARAMETER["false_easting",400000],'
               'PARAMETER["false_northing",-100000],UNIT["metre",1]]')
        p = crs.resolve_crs(wkt)
        r = crs.epsg_def(27700)
        lon = np.array([-1.0]); lat = np.array([52.0])
        xa, ya = crs.from_wgs84_lonlat(lon, lat, p)
        xb, yb = crs.from_wgs84_lonlat(lon, lat, r)
        assert abs(xa[0] - xb[0]) < 2e-3 and abs(ya[0] - yb[0]) < 2e-3

    def test_wkt_geogcs(self):
        wkt = ('GEOGCS["ETRS89",DATUM["European_Terrestrial_Reference_'
               'System_1989",SPHEROID["GRS 1980",6378137,298.257222101]],'
               'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')
        p = crs.resolve_crs(wkt)
        assert p.is_geographic and p.towgs84 is None

    def test_units_us_ft(self):
        p = crs.resolve_crs(
            "+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666"
            " +lat_0=40.16666666666666 +lon_0=-74 +x_0=300000 +y_0=0"
            " +ellps=GRS80 +units=us-ft")
        x_ft, y_ft = crs.from_wgs84_lonlat(np.array([-73.98]),
                                           np.array([40.75]), p)
        pm = crs.resolve_crs(
            "+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666"
            " +lat_0=40.16666666666666 +lon_0=-74 +x_0=300000 +y_0=0"
            " +ellps=GRS80")
        x_m, y_m = crs.from_wgs84_lonlat(np.array([-73.98]),
                                         np.array([40.75]), pm)
        # x_0 interpretation differs between unit variants; compare spans
        assert abs(x_ft[0] * (1200.0 / 3937.0) - x_m[0]) < 1e-6

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            crs.resolve_crs("EPSG:99999")
        with pytest.raises(NotImplementedError):
            crs.resolve_crs("+proj=imw_p +lat_1=30")


class TestGeoIntegration:
    def test_reproject_points_routes_new_codes(self):
        lon = np.array([-1.5]); lat = np.array([52.5])
        x, y = geo.reproject_points(lon, lat, "EPSG:4326", "EPSG:27700")
        lo, la = geo.reproject_points(x, y, "EPSG:27700", "EPSG:4326")
        assert abs(lo[0] + 1.5) < 1e-6 and abs(la[0] - 52.5) < 1e-6

    def test_legacy_codes_unchanged(self):
        # the legacy WGS84 table path must stay bit-identical (SQL mirrors)
        lon = np.array([6.0]); lat = np.array([52.0])
        x, y = geo.reproject_points(lon, lat, "EPSG:4326", "EPSG:32631")
        E, N = tr.tmerc_forward(lon, lat, lon0=3.0)
        assert x[0] == E[0] and y[0] == N[0]


class TestStatePlane:
    """NAD83 State Plane extract with US-survey-foot axis units."""

    def test_esb_pin(self):
        # Empire State Building in NY Long Island ftUS — public coordinate
        x, y = crs.transform(np.array([-73.9856567]),
                             np.array([40.7484847]),
                             "EPSG:4326", "EPSG:2263")
        assert abs(x[0] - 988224) < 30 and abs(y[0] - 211970) < 30

    def test_ft_vs_meter_ratio(self):
        # the ftUS variant is exactly the meter math scaled by 3937/1200
        d_ft = crs.epsg_def(2263)
        from dataclasses import replace

        d_m = replace(d_ft, to_meter=1.0)
        lon = np.array([-73.5]); lat = np.array([40.8])
        xf, yf = crs.from_wgs84_lonlat(lon, lat, d_ft)
        xm, ym = crs.from_wgs84_lonlat(lon, lat, d_m)
        assert abs(xf[0] * (1200.0 / 3937.0) - xm[0]) < 1e-6
        assert abs(yf[0] * (1200.0 / 3937.0) - ym[0]) < 1e-6

    @pytest.mark.parametrize("code", [2229, 2230, 2248, 2276, 2285, 2240,
                                      26943, 26971])
    def test_roundtrips(self, code):
        d = crs.epsg_def(code)
        lon0 = d.kw["lon0"]
        lat0 = d.kw.get("lat0") or d.kw.get("lat1")
        lon = np.array([lon0 + 0.7]); lat = np.array([lat0 + 0.6])
        x, y = crs.transform(lon, lat, "EPSG:4326", f"EPSG:{code}")
        lo, la = crs.transform(x, y, f"EPSG:{code}", "EPSG:4326")
        assert abs(lo[0] - lon[0]) < 1e-9 and abs(la[0] - lat[0]) < 1e-9


class TestWarpIntegration:
    def test_warp_from_osgb_raster(self, ray_session):
        """AffineWarper consumes registry CRS pairs: an EPSG:27700-
        georeferenced raster warps onto a WGS84 destination grid (the
        gdalwarp -s_srs/-t_srs surface through the round-5 front door)."""
        from gdal_ray.stages import pyramid as pyr

        E0, N0 = crs.transform(np.array([-1.6]), np.array([52.6]),
                               "EPSG:4326", "EPSG:27700")
        gy, gx = np.mgrid[0:128, 0:128]
        arr = ((gx + gy) % 97).astype(np.float64)
        src = pyr.SourceRaster(
            arr, (float(E0[0]), 50.0, 0.0, float(N0[0]), 0.0, -50.0),
            crs="EPSG:27700", nodata=-1.0)
        dst_gt = (-1.6001, 0.0008, 0.0, 52.6001, 0.0, -0.0005)
        out = pyr.warp_affine(src, dst_gt, width=96, height=96,
                              tile=48, dst_crs="EPSG:4326").to_pandas()
        nz = 0
        for r in out.itertuples():
            a = np.frombuffer(r.data, np.float64).reshape(r.height, r.width)
            nz += int((a != -1.0).sum())
        assert nz > 0.8 * 96 * 96

    def test_legacy_3857_warp_unchanged(self, ray_session):
        """The mercator dst path still dispatches to the identical closed
        form (oracle stability for warp_* queries)."""
        from gdal_ray.functions import geo

        dx = np.array([111319.49079327357])
        dy = np.array([222684.20850554405])
        a = geo.reproject_points(dx, dy, "EPSG:3857", "EPSG:4326")
        b = geo.mercator_to_lonlat(dx, dy)
        assert a[0][0] == b[0][0] and a[1][0] == b[1][0]


class TestWKT2:
    OSGB_WKT2 = '''PROJCRS["OSGB36 / British National Grid",
      BASEGEOGCRS["OSGB36",
        DATUM["Ordnance Survey of Great Britain 1936",
          ELLIPSOID["Airy 1830",6377563.396,299.3249646,
                    LENGTHUNIT["metre",1]]],
        PRIMEM["Greenwich",0]],
      CONVERSION["British National Grid",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",49,
                  ANGLEUNIT["degree",0.0174532925199433]],
        PARAMETER["Longitude of natural origin",-2,
                  ANGLEUNIT["degree",0.0174532925199433]],
        PARAMETER["Scale factor at natural origin",0.9996012717,
                  SCALEUNIT["unity",1]],
        PARAMETER["False easting",400000,LENGTHUNIT["metre",1]],
        PARAMETER["False northing",-100000,LENGTHUNIT["metre",1]]],
      CS[Cartesian,2],
      AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
      AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]'''

    def test_projcrs_os_example(self):
        d = crs.resolve_crs(self.OSGB_WKT2)
        assert d.family == "tmerc" and abs(d.a - 6377563.396) < 1e-6
        lon = np.array([1 + 43 / 60 + 4.5177 / 3600])
        lat = np.array([52 + 39 / 60 + 27.2531 / 3600])
        E, N = tr.tmerc_forward(lon, lat, a=d.a, f=d.f, **d.kw)
        assert abs(E[0] - 651409.903) < 1e-3
        assert abs(N[0] - 313177.270) < 1e-3

    def test_geogcrs(self):
        w = ('GEOGCRS["ETRS89",DATUM["European Terrestrial Reference '
             'System 1989",ELLIPSOID["GRS 1980",6378137,298.257222101,'
             'LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0],CS[ellipsoidal'
             ',2],AXIS["latitude",north],AXIS["longitude",east],'
             'ANGLEUNIT["degree",0.0174532925199433]]')
        d = crs.resolve_crs(w)
        assert d.is_geographic and abs(1.0 / d.f - 298.257222101) < 1e-6

    def test_boundcrs_towgs84(self):
        w = ('BOUNDCRS[SOURCECRS[' + self.OSGB_WKT2 + '],'
             'TARGETCRS[GEOGCRS["WGS 84",DATUM["WGS84",ELLIPSOID['
             '"WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],'
             'PRIMEM["Greenwich",0],CS[ellipsoidal,2],'
             'AXIS["latitude",north],AXIS["longitude",east]]],'
             'ABRIDGEDTRANSFORMATION["OSGB36 to WGS 84",'
             'METHOD["Position Vector transformation"],'
             'PARAMETER["X-axis translation",446.448],'
             'PARAMETER["Y-axis translation",-125.157],'
             'PARAMETER["Z-axis translation",542.06],'
             'PARAMETER["X-axis rotation",0.1502],'
             'PARAMETER["Y-axis rotation",0.247],'
             'PARAMETER["Z-axis rotation",0.8421],'
             'PARAMETER["Scale difference",-20.4894]]]')
        d = crs.resolve_crs(w)
        assert d.towgs84 is not None and abs(d.towgs84[0] - 446.448) < 1e-9
        # full parity with the registry's EPSG:27700 through WGS84
        r = crs.epsg_def(27700)
        lon = np.array([-1.0]); lat = np.array([52.0])
        xa, ya = crs.from_wgs84_lonlat(lon, lat, d)
        xb, yb = crs.from_wgs84_lonlat(lon, lat, r)
        assert abs(xa[0] - xb[0]) < 1e-3 and abs(ya[0] - yb[0]) < 1e-3
