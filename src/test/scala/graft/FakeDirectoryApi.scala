package graft

import graft.sources.HttpPagedSource.Transport

/** Shared fake Urban-API transport: two years of Directory-ish data.
  * 2010 uses canonical field names across two pages (relative `next`);
  * 2011 drifts field names (instnm/stabbr/lat/lon/sector_cd) and contains
  * every dirty shape from the FIXTURES.md §A checklist.
  */
class FakeDirectoryApi extends Transport {
  var calls: List[String] = Nil
  var failuresToInject: Int = 0

  private val y2010p1 =
    """{"results":[
      {"unitid":100654,"year":2010,"inst_name":"Alabama A & M University","city":"Normal","state_abbr":"AL","sector":1,"latitude":34.783368,"longitude":-86.568502},
      {"unitid":100663,"year":2010,"inst_name":"U Alabama Birmingham","city":"Birmingham","state_abbr":"AL","sector":1,"latitude":33.505697,"longitude":-86.799345}],
      "next":"/college-university/ipeds/directory/2010/?page=2"}"""
  private val y2010p2 =
    """{"results":[
      {"unitid":100690,"year":2010,"inst_name":"Amridge University","city":"Montgomery","state_abbr":"AL","sector":2,"latitude":32.362609,"longitude":-86.17401}],
      "next":null}"""
  private val y2011 =
    """{"results":[
      {"unitid":100654,"instnm":"Alabama A & M University (renamed)","city":" Normal ","stabbr":"AL","sector_cd":1,"lat":"34.783368","lon":"-86.568502"},
      {"unitid":100663,"year":2011,"instnm":"-1","name":"UAB","stabbr":"-2","state":"AL","sector":"-3","control":"1","fips":"12.5"},
      {"unitid":999999,"year":2011,"inst_name":"   ","city":"","sector":-2,"fips":-1,"latitude":-3}],
      "next":null}"""

  override def get(url: String): String = {
    calls = url :: calls
    if (failuresToInject > 0) {
      failuresToInject -= 1
      throw new RuntimeException("injected 503")
    }
    url match {
      case u if u.endsWith("/2010/") => y2010p1
      case u if u.endsWith("/2010/?page=2") => y2010p2
      case u if u.endsWith("/2011/") => y2011
      case u => throw new RuntimeException(s"404 $u")
    }
  }
}
